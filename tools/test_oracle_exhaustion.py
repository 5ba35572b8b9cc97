#!/usr/bin/env python3
"""Oracle-side pair-exhaustion test (round-13 ADVICE).

The tokenizer-training oracles (text_bpe_train / text_wordpiece_train)
replay the engine's greedy merge chain as a fixed-depth CTE chain. The
ENGINE stops early on pair exhaustion (BPE: no pairs at all; WordPiece:
no pair over the min-frequency floor) and keeps the state; the ORACLE
still emits every round, so an empty best-pair CTE must pass the state
through UNCHANGED (the COALESCE(chr(2)) no-op target in bpeRewriteSql)
rather than NULLing it and every downstream round.

This test runs the dumped oracle SQL against crafted corpora where
exhaustion triggers (it never does at the driver's test SFs) and
asserts the passthrough:
  - WordPiece: 5x "a b" + 1x "c" — round 1 merges ("a","b") at cnt=5,
    every later round has no pair over the floor.
  - BPE: single-token docs — no pair exists at any round.

Usage:
  python3 tools/test_oracle_exhaustion.py <outDir-with-oracle_sql.json> <sfDir>
(<sfDir> = the dir Verify bound into the dumped SQL; the test re-points
documents.parquet at the crafted corpus.)
"""
import sys, os, json, tempfile
import duckdb


def run(sql, sf_dir, docs_dir):
    con = duckdb.connect()
    sql = sql.replace(os.path.join(sf_dir, "documents.parquet"),
                      os.path.join(docs_dir, "documents.parquet"))
    return con.sql(sql).fetchall()


def make_docs(path, texts):
    con = duckdb.connect()
    rows = ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    con.sql(f"""COPY (SELECT * FROM (VALUES {rows}) t(doc_id, text))
                TO '{os.path.join(path, "documents.parquet")}'
                (FORMAT PARQUET)""")


def main(out_dir, sf_dir):
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0

    with tempfile.TemporaryDirectory() as d:
        # WordPiece: round 1 merges, round 2+ exhaust under the floor (5)
        make_docs(d, ["a b"] * 5 + ["c"])
        got = sorted(run(oracles["text_wordpiece_train"], sf_dir, d))
        want = sorted([(i, 1, "a\x01b") for i in range(5)] + [(5, 1, "c")])
        if got != want:
            print(f"FAIL wordpiece mid-chain exhaustion:\n  got {got}\n  want {want}")
            failures += 1
        else:
            print("PASS wordpiece mid-chain exhaustion (merge round 1, passthrough after)")

    with tempfile.TemporaryDirectory() as d:
        # WordPiece: exhausted from round 1 (no pair reaches the floor)
        make_docs(d, ["a b", "c d", "e f"])
        got = sorted(run(oracles["text_wordpiece_train"], sf_dir, d))
        want = sorted([(0, 2, "a b"), (1, 2, "c d"), (2, 2, "e f")])
        if got != want:
            print(f"FAIL wordpiece round-1 exhaustion:\n  got {got}\n  want {want}")
            failures += 1
        else:
            print("PASS wordpiece round-1 exhaustion (full passthrough)")

    with tempfile.TemporaryDirectory() as d:
        # BPE: single-token docs — no pair exists, every round passes through
        make_docs(d, ["a", "b", "c"])
        got = sorted(run(oracles["text_bpe_train"], sf_dir, d))
        want = sorted([(0, 1, "a"), (1, 1, "b"), (2, 1, "c")])
        if got != want:
            print(f"FAIL bpe exhaustion:\n  got {got}\n  want {want}")
            failures += 1
        else:
            print("PASS bpe exhaustion (full passthrough)")

    with tempfile.TemporaryDirectory() as d:
        # BATCHED WordPiece: one disjoint pair clears the floor in round 1
        # (the other 3 rewrite links of the 4-merge batch are EMPTY and
        # must pass through), round 2 exhausts entirely
        make_docs(d, ["a b"] * 5 + ["c"])
        got = sorted(run(oracles["text_wordpiece_train_batched"], sf_dir, d))
        want = sorted([(i, 1, "a\x01b") for i in range(5)] + [(5, 1, "c")])
        if got != want:
            print(f"FAIL batched wordpiece short round:\n  got {got}\n  want {want}")
            failures += 1
        else:
            print("PASS batched wordpiece short round (1 of 4 links live, rest pass through)")

    if failures:
        sys.exit(1)
    print("oracle exhaustion: all green")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
