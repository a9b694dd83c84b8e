"""Differential fuzzing of the pattern-vetting classifier.

``compiler.is_vetted_pattern`` hand-derives a subset of regex syntax on
which Java ``rlike`` (with the ``(?dU)`` alignment prefix) and Python
``re`` — the kernel fallback, which IS jesse's `re:run` ground truth
(`jesse_validator_draft3.erl:744-749`) — agree. This suite
property-tests that claim: generate patterns from a grammar spanning
both the vetted subset and the excluded constructs, and for every
VETTED pattern assert Java and Python agree on a corpus of tricky
strings (newlines, \r, unicode digits/whitespace, $-tails, empties).

Non-vetted patterns need no differential check — they are routed to the
Python kernel, which is the reference semantics by definition.

The corpus deliberately EXCLUDES the two documented residual classes
(`compiler.JAVA_VETTED_PREFIX` notes): No/Nl alnum chars ('²', 'Ⅻ') and
U+001C..U+001F, where Python's str-predicate-based \\w / \\s differ
from Unicode property tables in ANY Java mode.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from sparkjesse.compiler import is_vetted_pattern, java_vetted_pattern

SEED = 20260817
TARGET_VETTED = 1200
MAX_ATTEMPTS = 30000

# strings chosen to stress ., ^, $, \b, \d, \s, \w, quantifier
# backtracking, and class edge cases
CORPUS = [
    "",
    "a",
    "abc",
    "aXbc",
    "foo",
    "foo\n",
    "foo\r",
    "foo\r\n",
    "a\rc",
    "a\nc",
    "line1\nline2",
    " leading",
    "trailing ",
    "tab\tsep",
    "123",
    "١٢٣",        # Arabic-Indic digits (Nd)
    "a b  c",
    "mixedCASE",
    "under_score",
    "dash-dash",
    "dot.dot",
    "[]{}()",
    "a+b*c?",
    "nbsp x",
    "café au lait",
    "ends$",
    "^starts",
    "u2028 x",              # LINE SEPARATOR (White_Space)
    "nelx",                # NEXT LINE (White_Space)
    "a" * 40,
    "ab" * 20 + "c",
]

_LITERALS = list("abcxz019 _-,")
_SAFE_ESCAPED = ["\\d", "\\D", "\\w", "\\W", "\\s", "\\S", "\\b",
                 "\\n", "\\t", "\\.", "\\$", "\\^", "\\\\", "\\+", "\\*",
                 "\\[", "\\]", "\\(", "\\)", "\\{", "\\}", "\\|"]
_UNSAFE = ["\\A", "\\z", "\\Z", "\\G", "\\p{L}", "\\x41", "\\1", "\\v",
           "\\e", "\\Q", "\\k<g>", "\\0",
           "\\B"]  # fuzz finding: Java \B matches on the empty string


def _gen_class(rng: random.Random) -> str:
    parts = []
    if rng.random() < 0.25:
        parts.append("^")
    if rng.random() < 0.15:
        parts.append("]")  # leading ] — literal in PCRE; probe Java
    n = rng.randint(1, 4)
    for _ in range(n):
        r = rng.random()
        if r < 0.45:
            parts.append(rng.choice("abcxyz0159_ .$^+*"))
        elif r < 0.70:
            lo = rng.choice("acf03")
            hi = chr(ord(lo) + rng.randint(1, 5))
            parts.append(f"{lo}-{hi}")
        elif r < 0.85:
            parts.append(rng.choice(["\\d", "\\w", "\\s", "\\]", "\\[",
                                     "\\-", "\\\\"]))
        elif r < 0.92:
            parts.append(rng.choice(["[:alpha:]", "a[b", "b&&c"]))  # unsafe
        else:
            parts.append("-")
    return "[" + "".join(parts) + "]"


def _gen_atom(rng: random.Random, depth: int) -> str:
    r = rng.random()
    if r < 0.30:
        return rng.choice(_LITERALS)
    if r < 0.45:
        return rng.choice(_SAFE_ESCAPED)
    if r < 0.50:
        return rng.choice(_UNSAFE)
    if r < 0.60:
        return _gen_class(rng)
    if r < 0.66:
        return "."
    if r < 0.72 and depth < 2:
        inner = _gen_seq(rng, depth + 1)
        kind = rng.random()
        if kind < 0.5:
            return f"(?:{inner})"
        if kind < 0.75:
            return f"({inner})"
        return rng.choice([f"(?={inner})", f"(?i){inner}",
                           f"(?P<g>{inner})", f"(?<={inner})"])
    if r < 0.80 and depth < 2:
        return _gen_seq(rng, depth + 1) + "|" + _gen_seq(rng, depth + 1)
    if r < 0.90:
        return rng.choice(["^", "$"])
    # raw brace/quantifier fragments — literal in Python, error in Java
    return rng.choice(["{", "{2", "{a}", "}", "{1,2"])


def _quantify(rng: random.Random, atom: str) -> str:
    r = rng.random()
    if r < 0.55:
        return atom
    if r < 0.70:
        q = rng.choice(["*", "+", "?"])
    elif r < 0.85:
        m = rng.randint(0, 3)
        q = rng.choice([f"{{{m}}}", f"{{{m},}}", f"{{{m},{m + 2}}}"])
    else:
        q = rng.choice(["*+", "++", "?+", "{1,2}+"])  # possessive (Java)
    if rng.random() < 0.3:
        q += "?"
    return atom + q


def _gen_seq(rng: random.Random, depth: int = 0) -> str:
    n = rng.randint(1, 4 if depth else 6)
    return "".join(_quantify(rng, _gen_atom(rng, depth))
                   for _ in range(n))


def _generate(rng: random.Random):
    """Yield (pattern, vetted, compiled) for Python-valid patterns."""
    seen = set()
    for _ in range(MAX_ATTEMPTS):
        p = _gen_seq(rng)
        if p in seen:
            continue
        seen.add(p)
        try:
            compiled = re.compile(p)
        except re.error:
            continue  # engine never sees Python-invalid patterns:
            # compile() raises at schema-compile time on the kernel
            # path, and the vetted path is a subset of valid syntax
        yield p, is_vetted_pattern(p), compiled


def test_vetted_patterns_agree_with_python_re(spark):
    rng = random.Random(SEED)
    rows = []
    n_vetted = n_total = 0
    for p, vetted, compiled in _generate(rng):
        n_total += 1
        if not vetted:
            continue
        n_vetted += 1
        jp = java_vetted_pattern(p)
        for s in CORPUS:
            rows.append((p, jp, s, bool(compiled.search(s))))
        if n_vetted >= TARGET_VETTED:
            break
    # the generator must actually exercise the vetted subset at scale
    assert n_vetted >= 1000, (n_vetted, n_total)

    df = spark.createDataFrame(rows, ["pattern", "jp", "s", "expected"])
    mismatches = (df.withColumn("got", F.expr("s rlike jp"))
                    .where(F.col("got") != F.col("expected"))
                    .select("pattern", "s", "expected", "got")
                    .limit(40)
                    .collect())
    assert not mismatches, [
        (r["pattern"], repr(r["s"]), r["expected"], r["got"])
        for r in mismatches]


def test_fuzz_generator_covers_unsafe_constructs():
    """Meta-test: the grammar really produces the excluded constructs
    (else the differential pass proves less than it claims)."""
    rng = random.Random(SEED)
    non_vetted = [p for p, vetted, _ in _generate(rng) if not vetted]
    joined = " ".join(non_vetted[:5000])
    # only Python-VALID constructs can reach the classifier (a pattern
    # Python can't compile fails at schema-compile time on any path),
    # so e.g. \p{L} / \e / \Q are rightly absent here
    for marker in ["\\A", "\\B", "(?i)", "(?=", "[:alpha:]", "&&",
                   "++", "{a}"]:
        assert marker in joined, marker
