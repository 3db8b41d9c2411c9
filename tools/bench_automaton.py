#!/usr/bin/env python3
"""Automaton micro-bench: trie regex vs flat alternation vs pure-Python AC.

Run: python tools/bench_automaton.py
Source of the throughput numbers cited in extract/automaton.py — match
MB/s per core at 10^3 / 10^4 / 10^5 gazetteer surfaces on a fixed text.
"""

from __future__ import annotations

import random
import re
import sys
import time

sys.path.insert(0, ".")

from codebased_spark.extract.automaton import AhoCorasick, build_trie_regex

FIRST = [
    "Acme", "Globex", "Initech", "Umbra", "Vandelay", "Wayne", "Stark",
    "Tyrell", "Nova", "Zenith", "Apex", "Orion", "Vertex", "Quant",
]
SECOND = [
    "Corporation", "Industries", "Systems", "Holdings", "Labs", "Group",
    "Dynamics", "Analytics", "Partners", "Capital", "Networks", "Logistics",
]
FILLER = ["the", "market", "reacted", "to", "news", "of", "growth",
          "analysts", "expect", "steady"]


def make_surfaces(n: int, rng: random.Random) -> list[str]:
    out: set[str] = set()
    i = 0
    while len(out) < n:
        s = f"{rng.choice(FIRST)}{i % 977} {rng.choice(SECOND)}"
        if rng.random() < 0.3:
            s += " " + rng.choice(SECOND)
        out.add(s)
        i += 1
    return sorted(out)


def build_flat(surfaces) -> re.Pattern:
    alts = sorted(surfaces, key=len, reverse=True)
    return re.compile(
        r"(?<![\w])(?:" + "|".join(re.escape(s) for s in alts) + r")(?![\w])"
    )


def main() -> None:
    rng = random.Random(7)
    pool = make_surfaces(200, rng)
    words = [
        rng.choice(pool) if rng.random() < 0.1 else rng.choice(FILLER)
        for _ in range(2000)
    ]
    text = " ".join(words)
    print(f"text: {len(text)} bytes")

    for n in (1_000, 10_000, 100_000):
        surfaces = make_surfaces(n, rng) + pool
        t0 = time.perf_counter()
        trie = build_trie_regex(surfaces)
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(20):
            m_trie = [(m.start(), m.end()) for m in trie.finditer(text)]
        t_m = (time.perf_counter() - t0) / 20

        flat = build_flat(surfaces)
        t0 = time.perf_counter()
        m_flat = [(m.start(), m.end()) for m in flat.finditer(text)]
        f_m = time.perf_counter() - t0

        t0 = time.perf_counter()
        ac = AhoCorasick(surfaces)
        a_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        m_ac = list(ac.iter_matches(text))
        a_m = time.perf_counter() - t0

        agree = m_trie == m_flat == m_ac
        print(
            f"n={n}: trie compile {t_c:.2f}s match {len(text)/t_m/1e6:.1f} MB/s"
            f" | flat match {len(text)/f_m/1e6:.3f} MB/s"
            f" | AC build {a_c:.2f}s match {len(text)/a_m/1e6:.2f} MB/s"
            f" | agree={agree} ({len(m_trie)} matches)"
        )


if __name__ == "__main__":
    main()
