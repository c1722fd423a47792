#!/usr/bin/env python3
"""Mechanically retire the cross-engine round(double, k) tie class.

Spark's round(double, k) HALF_UPs the shortest decimal representation
(BigDecimal-of-string); DuckDB rounds the binary double value. On an
exact k-dp half the two disagree even on bit-identical inputs — the r15
sf1 sweep caught one such flip (q_ski_area_point). The engine-agnostic
form floor(x*10^k + 0.5)/10^k is pure IEEE double arithmetic, so it is
bit-identical across engines on identical inputs (ties round toward +∞
on BOTH sides by construction — this intentionally differs from
HALF_UP for negative halves, consistently on both sides).

This tool rewrites every `round(ARG)` / `round(ARG, k)` call site in
the given .scala files — Spark Column code and embedded oracle SQL both
take the same textual form — EXCEPT sites that are:
  - inside line comments / scaladoc (`//`, leading `*`),
  - on DECIMAL-cast arguments (decimal rounding is exact and
    engine-consistent; converting to double math would LOSE exactness),
  - non-literal or negative scales (flagged for manual review),
  - word-boundary false positives (bround, Math.round, .round).

Dev tooling only — not part of the library. Run:
  python3 tools/retire_round.py --check src/main/scala/graft/**.scala
  python3 tools/retire_round.py --apply <files>
"""
import re
import sys


def find_sites(text):
    """Yield (start, end, arg_text) for each standalone round( call."""
    for m in re.finditer(r"(?<![\w.])round\(", text):
        start = m.start()
        # comment context: // before it on the same line, or a scaladoc
        # line (leading *). SQL margin lines lead with | so no clash.
        bol = text.rfind("\n", 0, start) + 1
        prefix = text[bol:start]
        if "//" in prefix or prefix.lstrip().startswith("*"):
            continue
        # a local `def round(` is not a rounding call site
        if re.search(r"def\s+$", prefix):
            continue
        depth, i = 1, m.end()
        while depth > 0 and i < len(text):
            c = text[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        if depth != 0:
            raise SystemExit(f"unbalanced parens at offset {start}")
        yield start, i, text[m.end():i - 1]


def split_args(arg):
    """Split top-level comma: (expr, scale) or (expr,)."""
    depth = 0
    for i, c in enumerate(arg):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            return arg[:i], arg[i + 1:]
    return arg, None


def rewrite(text, path, apply_):
    out, pos, changed, skipped = [], 0, 0, []
    for start, end, arg in find_sites(text):
        expr, scale = split_args(arg)
        lineno = text.count("\n", 0, start) + 1
        if "DECIMAL" in expr or "decimal" in expr:
            skipped.append((path, lineno, "decimal-cast arg"))
            continue
        # an odd number of quotes means the call's parens cross a
        # string-literal boundary (SQL built from concatenated
        # fragments) — the textual wrap would land in different string
        # contexts at the two ends; hand-fix those
        if arg.count('"') % 2 == 1:
            skipped.append((path, lineno, "crosses string boundary"))
            continue
        if scale is not None:
            s = scale.strip()
            if not re.fullmatch(r"\d+", s):
                skipped.append((path, lineno, f"non-literal scale {s!r}"))
                continue
            k = int(s)
        else:
            k = 0
        # outer parens so trailing method calls (.as, .cast) and SQL
        # operator precedence bind to the whole quotient, not the 1eK
        if k == 0:
            new = f"floor(({expr.strip()}) + 0.5)"
        else:
            new = f"(floor(({expr.strip()}) * 1e{k} + 0.5) / 1e{k})"
        out.append(text[pos:start])
        out.append(new)
        pos = end
        changed += 1
    out.append(text[pos:])
    return "".join(out), changed, skipped


def main():
    apply_ = "--apply" in sys.argv
    files = [a for a in sys.argv[1:] if not a.startswith("--")]
    total, all_skipped = 0, []
    for path in files:
        text = open(path).read()
        new, changed, skipped = rewrite(text, path, apply_)
        all_skipped.extend(skipped)
        if changed and apply_:
            open(path, "w").write(new)
        if changed:
            print(f"{path}: {changed} sites rewritten"
                  f"{'' if apply_ else ' (dry run)'}")
        total += changed
    for path, lineno, why in all_skipped:
        print(f"  SKIP {path}:{lineno} — {why}")
    print(f"{total} sites total, {len(all_skipped)} skipped")


if __name__ == "__main__":
    main()
