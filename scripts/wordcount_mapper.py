#!/usr/bin/env python3
"""Hadoop-Streaming word-count mapper (reference-parity semantics).

Contract (SURVEY.md §2.1): stdin = raw text lines of one input shard;
stdout = one ``key\tvalue`` line per emitted pair. Tokenizer semantics
match the reference's shipped mapper (client/scripts/mapper.py:13):
lowercase, ASCII letter runs that may contain internal ASCII/Unicode
apostrophes but must start and end with a letter.

Fresh implementation of the public Hadoop-Streaming contract — not a
copy of the reference script.
"""
import re
import sys

TOKEN = re.compile(r"[a-z](?:[a-z'‘’]*[a-z])?")


def main() -> None:
    out = sys.stdout
    for line in sys.stdin:
        for tok in TOKEN.findall(line.lower()):
            out.write(tok)
            out.write("\t1\n")


if __name__ == "__main__":
    main()
