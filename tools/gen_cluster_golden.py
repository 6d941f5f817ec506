"""Regenerate the sql_audio_dedup_clusters VALUES golden (entry_queries.py).

A fully INDEPENDENT python re-implementation of the dedup semantics over the
seeded 150-clip corpus -- union-find instead of large/small-star connected
components, direct band-tuple comparison instead of banded bucket joins,
O(n*m) dynamic-programming LCS instead of suffix arrays -- so the driver's
DuckDB cross-check genuinely verifies the Spark pipeline rather than
replaying it. Rerun and paste the output whenever the seeded corpus, the
feature/text kernels, or DedupConfig defaults change.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_lsh_spark.config import DedupConfig  # noqa: E402
from go_lsh_spark.functions import fasthash as FH  # noqa: E402
from go_lsh_spark.functions.audio import decode_wav, envelope_features  # noqa: E402
from go_lsh_spark.hyperplanes import PlaneSet  # noqa: E402
from go_lsh_spark.oracle import pearson  # noqa: E402
from go_lsh_spark.sources.synth import synth_clips  # noqa: E402

I64_MAX = (1 << 63) - 1


def lcs_len(a: str, b: str) -> int:
    """Longest common substring, classic DP (test-scale only)."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    best = 0
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        ca = a[i - 1]
        for j in range(1, len(b) + 1):
            if ca == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best


def compute_clusters(n_clips: int = 150, seed: int = 42) -> list[tuple[str, str]]:
    cfg = DedupConfig()
    planes = PlaneSet(cfg.lsh_config())
    res = synth_clips(n_clips=n_clips, seed=seed)
    total_bits = cfg.num_bands * cfg.rows_per_band
    weights = 1 << np.arange(63, 63 - total_bits, -1, dtype=np.uint64)
    seeds = FH.perm_seeds(cfg.num_perm, seed=cfg.seed)

    ids, sigs, feats, mh, wn, tr = [], [], [], [], [], []
    for _, r in res.clips.iterrows():
        pcm, _ = decode_wav(r["bytes"])
        f = envelope_features(pcm, cfg.feature_dim)
        m = f.copy()
        if cfg.center_features:
            m -= m.mean()
        nn = np.linalg.norm(m)
        if nn != 0:
            m = m / nn
        bits = (m @ planes.stacked.T) > 0.0
        sig = np.uint64((bits.astype(np.uint64) * weights).sum())
        t = r["transcript"] or ""
        ids.append(r["clip_id"])
        sigs.append(sig)
        feats.append(f)
        mh.append(FH.minhash_from_hashes(FH.shingle_hashes_bytes(t.encode(), cfg.shingle_k), seeds))
        wn.append(set(FH.winnow_from_hashes(FH.shingle_hashes_bytes(t.encode(), cfg.winnow_k), cfg.winnow_window).tolist()))
        tr.append(t)
    n = len(ids)

    # winnow document-frequency cap (bucket size == df)
    df = defaultdict(int)
    for s in wn:
        for fp in s:
            df[fp] += 1
    kept = {fp for fp, c in df.items() if 2 <= c <= cfg.winnow_max_df}
    wn = [s & kept for s in wn]

    # candidate sources (direct band-tuple comparison)
    cand: dict[tuple[int, int], dict] = {}

    def touch(i, j):
        key = (i, j) if ids[i] < ids[j] else (j, i)
        return cand.setdefault(key, {"sim": False, "min": False, "nwin": 0})

    band_mask = (1 << cfg.rows_per_band) - 1
    sim_buckets = defaultdict(list)
    for i, s in enumerate(sigs):
        for b in range(cfg.num_bands):
            band = int((s >> np.uint64(b * cfg.rows_per_band)) & np.uint64(band_mask))
            sim_buckets[(b, band)].append(i)
    for members in sim_buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                ham = bin(int(sigs[i] ^ sigs[j])).count("1")
                if ham <= cfg.max_hamming:  # early Hamming budget (simhash src)
                    touch(i, j)["sim"] = True

    min_buckets = defaultdict(list)
    for i, sig in enumerate(mh):
        if int(sig[0]) == I64_MAX:  # empty-transcript sentinel: no evidence
            continue
        for b in range(cfg.minhash_bands):
            key = (b, tuple(int(v) for v in sig[b * cfg.minhash_rows : (b + 1) * cfg.minhash_rows]))
            min_buckets[key].append(i)
    for members in min_buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                touch(members[x], members[y])["min"] = True

    win_buckets = defaultdict(list)
    for i, s in enumerate(wn):
        for fp in s:
            win_buckets[fp].append(i)
    for members in win_buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                touch(members[x], members[y])["nwin"] += 1

    # verification (the batch verify_pairs predicate set)
    parent = {c: c for c in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for (i, j), ev in cand.items():
        from_win = ev["nwin"] >= cfg.winnow_min_matches
        if not (ev["sim"] or ev["min"] or from_win):
            continue
        ham = bin(int(sigs[i] ^ sigs[j])).count("1")
        if not (ham <= cfg.max_hamming or ev["min"] or from_win):
            continue
        s = pearson(feats[i], feats[j])
        audio_ok = ham <= cfg.max_hamming and not np.isnan(s) and s >= cfg.threshold
        sentinel = int(mh[i][0]) == I64_MAX or int(mh[j][0]) == I64_MAX
        jac = None if sentinel else float((mh[i] == mh[j]).mean())
        text_ok = jac is not None and jac >= cfg.jaccard_threshold
        ok = audio_ok or text_ok
        if not ok and from_win:
            ok = lcs_len(tr[i], tr[j]) >= cfg.min_common_substring
        if ok:
            union(ids[i], ids[j])

    return sorted((c, find(c)) for c in ids)


def main() -> None:
    rows = compute_clusters()
    print(",\n".join(f"      ('{cid}', '{cl}')" for cid, cl in rows))


if __name__ == "__main__":
    main()
