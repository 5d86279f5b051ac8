#!/usr/bin/env python3
"""Planted-corpus check for the BPE round-replay oracles.

The q_bpe_train / q_bpe_apply DuckDB oracles replay the merge sequence
via delimiter-guarded string replace. The replay is only equivalent to
the greedy left-to-right fold when each symbol carries its OWN delimiter
pair ('|a||b||a|'): with a shared delimiter ('|a|b|a|'), back-to-back
occurrences of the winning pair overlap on the middle '|' and replace
skips every second occurrence ('banana' diverges at round 2). The fixed
test corpus never hit that case, so this check plants one that does —
words like 'banana' / 'abab' / 'aaaa' where round winners repeat
adjacently — and runs the REAL pipeline over it: graft.Verify dumps the
Spark results + generated oracle SQL, then the local DuckDB compare must
hash-match both queries.

Usage: python3 tools/check_bpe_oracle.py   (exits 1 on any mismatch)
"""
import os, subprocess, sys, tempfile

sys.path.insert(0, os.path.dirname(__file__))
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Back-to-back winner coverage: 'banana'/'bananana' repeat (a,n) and then
# ('an','a') adjacently, 'abab'/'ababab' repeat (a,b), 'aaaa' overlaps a
# self-pair — plus longer filler words so 8 training rounds never exhaust.
TEXTS = [
    "banana banana abab cabbage",
    "bananana abab abab papaya",
    "banana aaaa aaaa cacao",
    "ababab banana cabbage papaya",
    "aaaa bananana cacao abab",
]

def main() -> int:
    sf = tempfile.mkdtemp(prefix="graft_bpe_planted_")
    out = tempfile.mkdtemp(prefix="graft_bpe_planted_out_")
    rows = [(i + 1, t, "en", len(t)) for i, t in enumerate(TEXTS)]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
        "n_chars": pa.array([r[3] for r in rows], pa.int32()),
    }), os.path.join(sf, "documents.parquet"))
    subprocess.run(
        [os.path.join(REPO, "tools", "run_main.sh"), "graft.Verify",
         sf, out, "q_bpe_train,q_bpe_apply"], check=True)
    import local_verify
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        local_verify.main(sf, out)
    print(buf.getvalue())
    ok = buf.getvalue().count("OK rows=")
    if ok != 2:
        print("FAIL: expected both q_bpe_train and q_bpe_apply to "
              "hash-match on the planted back-to-back corpus")
        return 1
    print("PASS: BPE replay oracles match the greedy fold on "
          "back-to-back winning pairs")
    return 0

if __name__ == "__main__":
    sys.exit(main())
