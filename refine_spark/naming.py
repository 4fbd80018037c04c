r"""Naming-rule engine: strip/replace/throw regex rewrite chain.

SURVEY.md §2.3 N1-N7. Semantics transcribed from the reference's rule
compiler (/root/reference/src/medias/naming.rs:44-90) and applier
(naming.rs:96-118); behavior pinned by the transcribed test vectors in
tests/test_naming.py (naming.rs:144-289).

The compiler runs driver-side (tiny); application is a fold of
`regexp_replace` Column expressions — fully JVM-side, whole-stage
codegen, no UDFs. Rows whose name is cleared by the rules are "blocked":
counted and excluded from the change plan.

Regex dialect note: the reference uses Rust `regex`; Spark uses Java
regex (a superset: backrefs/lookaround exist but these patterns don't
use them). `\b`/`\B`, `(?i)`, `$N` replacements behave identically on
the tested surface.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, functions as F

_O = r"[(\[{]"   # enclosing opening
_C = r"[)\]}]"   # enclosing closing
_SEP = r"[-\s.,]"

_WORD_END = re.compile(r"\w$")


def compile_rules(
    strip_before: Iterable[str] = (),
    strip_after: Iterable[str] = (),
    strip_exact: Iterable[str] = (),
    replace: Iterable[tuple[str, str]] = (),
    throw: Iterable[tuple[str, str]] = (),
) -> list[tuple[str, str]]:
    """Compile the five rule families into one ordered (pattern, repl) list.

    Order matches the reference: before, after, exact, replace, throw
    (naming.rs:66-82). All case-insensitive; `{S}` expands to the
    separator class.
    """
    rules: list[tuple[str, str]] = []
    for r in strip_before:
        rules.append((f"^.*{r}{_C}*{_SEP}*", ""))
    for r in strip_after:
        rules.append((f"{_SEP}*{_O}*{r}.*$", ""))
    for r in strip_exact:
        b = r"\b" if _WORD_END.search(r) else r"\B"
        rules.append(
            (
                f"^{_O}*{r}{_C}*{_SEP}+|{_SEP}+{_O}*{r}{_C}*$"
                f"|{_SEP}+{_O}*{r}{_C}*{b}|{_O}*{r}{_C}*",
                "",
            )
        )
    for k, v in replace:
        rules.append((k, v))
    for k, v in throw:
        rules.append((f"^{k}{_SEP}+(.+)$", f"$1 - {v}"))
    return [(f"(?i){p}".replace("{S}", _SEP), t) for p, t in rules]


def apply_rules_col(name: Column, rules: list[tuple[str, str]]) -> Column:
    """Fold the compiled rules into one regexp_replace expression chain."""
    out = name
    for pattern, repl in rules:
        out = F.regexp_replace(out, pattern, repl)
    return out


def apply_naming(
    df: DataFrame, rules: list[tuple[str, str]], name_col: str = "new_name"
) -> DataFrame:
    """Apply rules to `name_col`; adds boolean `blocked` (name cleared).

    The caller decides what to do with blocked rows (the reference drops
    them from the plan and prints a count — A12 receipt)."""
    applied = apply_rules_col(F.col(name_col), rules)
    return df.withColumn(name_col, applied).withColumn(
        "blocked", F.col(name_col) == ""
    )
