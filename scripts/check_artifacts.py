"""Docs-vs-artifacts consistency check (run before the end-of-round commit).

Round 4 ended with README/PERF 1b-clean but 5b-stale: PERF's 5b section
claimed "all phases measured" for settings no run had ever completed.
This script makes that class of drift mechanical to catch: every headline
number in README.md / PERF.md is declared below as a (doc regex ->
committed-artifact JSON path) claim, and any mismatch beyond tolerance is
a failure. Reference discipline being matched: every claim in
/root/reference/README.md is reproducible from its own text.

Also flags staleness: a `full_cascade` row carried forward from a previous
round (`carried_forward: true`) fails in --strict mode — the measured
end-to-end number must be refreshed at (or near) HEAD each round.

Usage:
    python scripts/check_artifacts.py [--strict]

Exit 0 = every claim matches; 1 = drift (mismatches listed on stderr).
"""
import json
import re
import sys

ROOT = __file__.rsplit("/", 2)[0]


def get(d, path):
    for k in path.split("."):
        d = d[k]
    return d


# (doc, regex-with-one-float-group, artifact, json path, rel tol)
# Tolerances: 0 = exact after rounding to the doc's precision; else
# relative. Docs round for prose (501.0 -> "501 s", 11442 -> "11.4k"),
# so each claim's regex captures the doc number at the doc's own
# precision and the comparison rounds the artifact to match.
CLAIMS = [
    # README.md — the 1b measured end-to-end story
    ("README.md", r"wall-clocks \*\*(\d+(?:\.\d+)?) s for",
     "bench_details.json", "full_cascade.wall_s", 0.002),
    ("README.md", r"for (\d+(?:\.\d+)?) audio-seconds at",
     "bench_details.json", "full_cascade.audio_sec", 0.005),
    ("README.md", r"\*\*(\d+(?:\.\d+)?) audio-seconds\ngenerated per chip-hour",
     "bench_details.json", "full_cascade.audio_sec_per_chip_hour", 0.002),
    ("README.md", r"extrapolates to (\d+(?:\.\d+)?)/hr",
     "bench_details.json", "value", 0.002),
    ("README.md", r"\((\d+(?:\.\d+)?)k tok/s int8\nupsampler",
     "bench_details.json", "phases.up_anc.tok_per_s", 0.05, 1e-3),
    ("README.md", r"(\d+(?:\.\d+)?)k tok/s top at bs=16",
     "bench_details.json", "phases.top.tok_per_s", 0.05, 1e-3),
    # PERF.md — headline table
    ("PERF.md", r"\*\*(\d+(?:\.\d+)?) audio-sec/chip-hour\*\* \((\d+(?:\.\d+)?) s for",
     "bench_details.json", "full_cascade.audio_sec_per_chip_hour", 0.002),
    ("PERF.md", r"audio-sec/chip-hour\*\* \((\d+(?:\.\d+)?) s for",
     "bench_details.json", "full_cascade.wall_s", 0.002),
    ("PERF.md", r" s for (\d+(?:\.\d+)?) audio-sec\) \| (\d+(?:\.\d+)?) \|",
     "bench_details.json", "full_cascade.audio_sec", 0.005),
    ("PERF.md", r"audio-sec\) \| (\d+(?:\.\d+)?) \|",
     "bench_details.json", "value", 0.002),
    # PERF.md — 1b per-phase decode rates (int8, the shipped default)
    ("PERF.md",
     r"top ancestral \(2048w[^|]*\|[^|]*\| \*\*\d+\*\* \| \*\*(\d+)\*\* \|",
     "bench_details.json", "phases.top.tok_per_s", 0.01),
    # PERF.md — 5b section (refreshed by this round's run)
    ("PERF.md", r"heads 8\) \| \*\*(\d+(?:\.\d+)?)\*\* \| 12 \|",
     "bench_details_5b.json", "phases.top.tok_per_s", 0.01),
    ("PERF.md", r"extrapolation: \*\*(\d+(?:\.\d+)?) audio-sec/chip-hour\*\*",
     "bench_details_5b.json", "value", 0.002),
]


def main():
    strict = "--strict" in sys.argv
    fails, checked = [], 0
    arts = {}
    for claim in CLAIMS:
        doc, pat, art, path, tol = claim[:5]
        scale = claim[5] if len(claim) > 5 else 1.0
        try:
            text = open(f"{ROOT}/{doc}").read()
        except OSError:
            fails.append(f"{doc}: unreadable")
            continue
        m = re.search(pat, text)
        if not m:
            fails.append(f"{doc}: claim pattern not found: {pat!r}")
            continue
        doc_val = float(m.group(1))
        if art not in arts:
            try:
                arts[art] = json.load(open(f"{ROOT}/{art}"))
            except (OSError, ValueError) as e:
                arts[art] = e
        if isinstance(arts[art], Exception):
            fails.append(f"{art}: unreadable ({arts[art]})")
            continue
        try:
            art_val = float(get(arts[art], path)) * scale
        except (KeyError, TypeError):
            fails.append(f"{art}:{path}: missing (claimed in {doc}: {doc_val})")
            continue
        # round the artifact to the doc's printed precision before comparing
        decimals = len(m.group(1).split(".")[1]) if "." in m.group(1) else 0
        art_rounded = round(art_val, decimals)
        ok = (abs(doc_val - art_rounded)
              <= tol * max(abs(art_rounded), 1e-9) + 10 ** -decimals * 0.51)
        checked += 1
        if not ok:
            fails.append(f"{doc} says {m.group(1)} but {art}:{path} = "
                         f"{art_val:g} (pattern {pat!r})")
    # staleness: measured end-to-end rows must not be carried forward
    if strict:
        for art in ("bench_details.json", "bench_details_5b.json"):
            try:
                d = json.load(open(f"{ROOT}/{art}"))
            except (OSError, ValueError):
                continue
            # a fresh (non-carried) measured end-to-end row ANYWHERE in
            # the file satisfies the freshness duty — e.g. an invocation
            # that measured into full_cascade_noalign carries the
            # canonical row forward without staleness
            fresh = any(k.startswith("full_cascade")
                        and not k.endswith("_error")
                        and isinstance(v, dict)
                        and not v.get("carried_forward")
                        for k, v in d.items())
            if "full_cascade" in d and not fresh:
                fails.append(
                    f"{art}: no fresh measured full_cascade* row — refresh "
                    f"the measured end-to-end run at HEAD before snapshot")
    for f in fails:
        print(f"DRIFT: {f}", file=sys.stderr)
    print(f"{checked} claims checked, {len(fails)} failures"
          + (" (strict)" if strict else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
