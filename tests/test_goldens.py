"""Golden drift-detection: the oracle must reproduce the committed goldens
byte-for-byte (guards the shared semantics modules against silent change)."""

import csv
import json
import os

from .gen_goldens import GOLDEN, run_two_waves


def test_oracle_matches_committed_goldens():
    st, o1, o2 = run_two_waves()

    want_seen = []
    with open(os.path.join(GOLDEN, "seen_set.txt")) as f:
        for line in f:
            kind, k = line.rstrip("\n").split("\t")
            want_seen.append((kind, k))
    got_seen = [
        (kind, k) for kind in sorted(st.seen) for k in sorted(st.seen[kind])
    ]
    assert got_seen == want_seen

    with open(os.path.join(GOLDEN, "crawl_order.csv")) as f:
        rows = list(csv.reader(f))[1:]
    got = [
        (str(c.sample_id), c.url, c.fetch_status)
        for o in (o1, o2)
        for c in o["scheduled"]
    ]
    assert [(r[0], r[1], r[2]) for r in rows] == got

    with open(os.path.join(GOLDEN, "counters.json")) as f:
        want = json.load(f)
    assert want == {"wave1": o1["counters"], "wave2": o2["counters"]}
