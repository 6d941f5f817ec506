"""Column-level kernels.

vector.py -- L2 normalize / Pearson / window-slice as pure Column
             expressions (whole-stage codegen) + sign-hash pandas UDFs
             (one Arrow-batched matmul against the broadcast plane tensor).
text.py   -- shingles, MinHash, SimHash-over-tokens, language id, quality
             scores, token counts, fingerprints.
audio.py  -- WAV (pcm_s16le) encode/decode + feature extraction, numpy-only.
"""
