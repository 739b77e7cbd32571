#!/usr/bin/env python3
"""Static lint for DuckDB oracle SQL — catches constructs that changed
behavior across DuckDB 1.x so a locally-green oracle (DuckDB 1.0) cannot
ship a binder error on the driver's newer DuckDB (≥1.1).

Round-8 incident: q127/q128 used ``md5('rp:' || j::VARCHAR || ...)``
inside a single-arrow lambda where ``j`` was a column captured from the
outer scope. DuckDB 1.0 binds it; the driver's ≥1.1 fails with
``Binder Error: No function matches '|'(VARCHAR, STRING_LITERAL)``.
Concat on the lambda's OWN parameter (q34/q35 ``md5(tok)`` chains) binds
fine on both — the lint therefore flags only ``||`` operands that are
identifiers NOT bound by an enclosing lambda.

Rules (ERROR → exit 1):
  E1  string-concat ``||`` inside a lambda whose operand is a BARE
      captured column (optionally cast). Indexed access on a captured
      list (``syms[j] || ' '`` — q88/q91/q121) is exempt: it was green
      on the driver's newer DuckDB in round 8, while q127's bare
      ``j::VARCHAR`` operand was not.
  E2  subquery (SELECT) inside a lambda body (never supported)
  E4  an emitted line's first non-space token is a lone ``|`` — the
      signature of Scala double-stripMargin eating the first pipe of a
      line-initial ``||`` concat (the ACTUAL round-8 q127/q128 root
      cause: a pre-stripped shared CTE fragment interpolated into a
      template that stripMargins again). Shared fragments must put
      ``||`` at line END, never line start.

Rules (WARN → printed, exit 0):
  W1  CTE referenced more than once downstream without AS MATERIALIZED
      (DuckDB inlines & re-expands per reference — multi-minute hangs)
  W2  oracle reduces directly over ``embedding`` without an explicit
      DOUBLE widening anywhere (FLOAT[] accumulation lands on round-6
      boundaries — ADVICE r6; warning only: q50/q62 are green with
      per-element widening the regex can't prove)

Usage:
  python3 tools/oracle_lint.py <oracle_sql.json | verifyOutDir>
"""
import json
import re
import sys
from pathlib import Path

KEYWORDS = {
    "case", "when", "then", "else", "end", "and", "or", "not", "in", "is",
    "null", "true", "false", "between", "like", "cast", "as", "distinct",
    "interval", "row", "varchar", "bigint", "integer", "double", "float",
    "boolean", "date", "timestamp", "decimal", "smallint", "tinyint",
    "hugeint", "utinyint", "usmallint", "uinteger", "ubigint",
}


def blank_strings(sql):
    """Replace string-literal CONTENTS with spaces, length-preserving.

    Lambda detection must not fire on ``->`` inside a SQL string literal
    (e.g. a regex or separator argument) — that would hard-fail the gate
    on a perfectly valid oracle. Length preservation keeps every offset
    valid against the original text.
    """
    return re.sub(r"'[^']*'",
                  lambda m: "'" + " " * (len(m.group(0)) - 2) + "'", sql)


def find_lambdas(sql):
    """Yield (params, body, offset) for every single-arrow lambda.

    A lambda is ``ident ->`` or ``(a, b) ->`` appearing inside a function
    call. The body runs until a comma or close-paren at the lambda's own
    paren depth. Nested lambdas are yielded separately, each body
    annotated with the params of every enclosing lambda too.
    String literals are blanked (length-preserving) BEFORE the scan, so a
    ``->`` inside a literal can neither start a lambda nor hide a
    delimiter from the body walk.
    """
    sql = blank_strings(sql)
    out = []
    for m in re.finditer(r"(\(\s*\w+(?:\s*,\s*\w+)*\s*\)|\b\w+)\s*->", sql):
        raw = m.group(1)
        params = set(re.findall(r"\w+", raw))
        start = m.end()
        depth = 0
        i = start
        while i < len(sql):
            c = sql[i]
            if c == "'":  # skip string literal
                i += 1
                while i < len(sql) and sql[i] != "'":
                    i += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                break
            i += 1
        out.append((params, sql[start:i], start))
    # annotate nested bodies with enclosing params
    res = []
    for params, body, off in out:
        all_params = set(params)
        for p2, b2, off2 in out:
            if off2 < off and off + len(body) <= off2 + len(b2):
                all_params |= p2
        res.append((all_params, body, off))
    return res


def strip_strings(s):
    return re.sub(r"'[^']*'", "''", s)


CAST_RE = r"(?:\s*::\s*\w+(?:\[\])?)?"


def concat_captured(params, body):
    """Identifiers that are direct ``||`` operands and not lambda params."""
    bad = set()
    clean = strip_strings(body)
    # left operand:  ident[::cast] ||     right operand: || ident[::cast]
    # (an identifier followed by '(' is a function call, one followed by
    # '[' is indexed list access — both exempt, see E1 in the module doc)
    for pat, grp in ((r"([A-Za-z_]\w*)" + CAST_RE + r"\s*\|\|", 1),
                     (r"\|\|\s*([A-Za-z_]\w*)\b(?!\s*[(\[])", 1)):
        for m in re.finditer(pat, clean):
            ident = m.group(grp)
            if ident.lower() in KEYWORDS or ident in params:
                continue
            bad.add(ident)
    return bad


def cte_refs(sql):
    """WARN-level: CTE names referenced >1 time without MATERIALIZED."""
    warns = []
    for m in re.finditer(r"(\w+)\s+AS\s+(MATERIALIZED\s+)?\(", sql,
                         re.IGNORECASE):
        name, mat = m.group(1), bool(m.group(2))
        if mat or name.lower() in ("as",):
            continue
        tail = sql[m.end():]
        refs = len(re.findall(r"\b(?:FROM|JOIN)\s+" + re.escape(name) + r"\b",
                              tail, re.IGNORECASE))
        if refs > 1:
            warns.append(f"CTE '{name}' referenced {refs}× without "
                         f"AS MATERIALIZED")
    return warns


def lint_one(name, sql):
    errors, warns = [], []
    for params, body, off in find_lambdas(sql):
        if "||" in strip_strings(body):
            bad = concat_captured(params, body)
            if bad:
                errors.append(
                    f"E1 captured-column concat inside lambda: "
                    f"{sorted(bad)} (params={sorted(params)}) — fails to "
                    f"bind on DuckDB >=1.1; precompute in a plain CTE")
        if re.search(r"\bSELECT\b", strip_strings(body), re.IGNORECASE):
            errors.append("E2 subquery inside lambda body")
    for i, line in enumerate(sql.split("\n"), 1):
        if re.match(r"\s*\|(?!\|)", line):
            errors.append(f"E4 line {i} starts with a lone '|' — "
                          f"double-stripMargin mangled a '||' concat: "
                          f"{line.strip()[:60]!r}")
    if re.search(r"list_(?:reduce|sum)\s*\(\s*(?:list_transform\s*\(\s*)?"
                 r"(?:\w+\.)?embedding\b", sql) and \
       not re.search(r"embedding\s*::\s*DOUBLE", sql, re.IGNORECASE) and \
       not re.search(r"\bDOUBLE\b", sql):
        warns.append("W2 reduction directly over 'embedding' with no DOUBLE "
                     "widening in sight (FLOAT[] accumulation diverges at "
                     "round-6)")
    warns.extend(cte_refs(sql))
    return errors, warns


def main(argv):
    if len(argv) != 2:
        print(__doc__)
        return 2
    p = Path(argv[1])
    if p.is_dir():
        p = p / "oracle_sql.json"
    oracles = json.loads(p.read_text())
    n_err = 0
    for name in sorted(oracles):
        errors, warns = lint_one(name, oracles[name])
        for e in errors:
            print(f"ERROR {name}: {e}")
            n_err += 1
        for w in warns:
            print(f"warn  {name}: {w}")
    print(f"oracle_lint: {len(oracles)} oracles, {n_err} errors")
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
