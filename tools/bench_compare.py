"""Compare two BENCH_FULL records per query (r14 vs r15 etc.).

Usage: python tools/bench_compare.py OLD.json NEW.json [--iso]
Prints shared-mode (or --iso isolated) per-query deltas sorted by
absolute improvement, plus totals and the noise ratios of both runs.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read())


def main():
    args = [a for a in sys.argv[1:] if a != "--iso"]
    iso = "--iso" in sys.argv
    old, new = load(args[0]), load(args[1])
    key = "queries_isolated" if iso else "queries"
    qo = old.get(key) or old["queries"]
    qn = new.get(key) or new["queries"]
    common = sorted(set(qo) & set(qn), key=lambda n: qo[n] - qn[n],
                    reverse=True)
    to = sum(qo[n] for n in common)
    tn = sum(qn[n] for n in common)
    print(f"common queries: {len(common)}  "
          f"old total {to:.1f}s -> new total {tn:.1f}s "
          f"({tn / to:.3f}x)")
    print(f"old noise ratio {old.get('noise', {}).get('ratio')}, "
          f"new {new.get('noise', {}).get('ratio')}")
    print("\ntop improvements:")
    for n in common[:25]:
        print(f"  {qo[n]:7.2f} -> {qn[n]:6.2f}  {n}")
    print("\ntop regressions:")
    for n in sorted(common, key=lambda n: qn[n] - qo[n], reverse=True)[:15]:
        print(f"  {qo[n]:7.2f} -> {qn[n]:6.2f}  {n}")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print("\nnew-only:", only_new)


if __name__ == "__main__":
    main()
