#!/usr/bin/env python
"""Summarize the r6c bounded-broadcast vs legacy-SMJ A/B artifacts.

Prints one row per artifact: strategy, corpus scale, composite efficiency,
per-level throughputs, and the list/text/commit phase walls at both levels —
the columns the fetch-strategy adjudication reads.
"""
import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def row(path: str) -> str:
    with open(path) as f:
        d = json.load(f)
    bc = d.get("bounded_fetch_broadcast")
    strat = "bcast" if bc else ("smj" if bc is not None else "?")
    lo, hi = d.get("phases_lo_s", {}), d.get("phases_hi_s", {})
    return (
        f"{os.path.basename(path):44s} {strat:5s} x{d.get('corpus_scale', 1)} "
        f"eff={d.get('scaling_efficiency'):5.3f} "
        f"thpt={d.get('thpt_lo_urls_per_s'):7.0f}/{d.get('thpt_hi_urls_per_s'):7.0f} "
        f"wall={d.get('wall_lo_s'):6.1f}/{d.get('wall_hi_s'):6.1f} "
        f"list={lo.get('list_fetch_parse', 0):5.1f}/{hi.get('list_fetch_parse', 0):5.1f} "
        f"text={lo.get('text_fetch_extract', 0):5.1f}/{hi.get('text_fetch_extract', 0):5.1f} "
        f"commit={lo.get('commit', 0):5.1f}/{hi.get('commit', 0):5.1f} "
        f"passes={d.get('per_pass_matched_ratio')}"
    )


if __name__ == "__main__":
    pats = sys.argv[1:] or ["scaling_4_to_16_r6b_s4*.json", "scaling_4_to_16_r6c_*.json"]
    for pat in pats:
        for p in sorted(glob.glob(os.path.join(HERE, pat))):
            print(row(p))
