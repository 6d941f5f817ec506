"""DataFrame operators re-expressing the reference's operator inventory
(SURVEY.md §2 O1-O16) plus the BASELINE.json dedup extensions."""
