#!/usr/bin/env python3
"""Generate golden fixtures for the unified-diff engine (parse.Diff).

The reference's devel.mkpatch (devel.py:919-1053) delegates to Python's
stdlib difflib.unified_diff; these fixtures pin our port to the stdlib
semantics byte-for-byte (SequenceMatcher longest-match selection,
autojunk popular-element pruning at >=200 lines, context grouping,
range formatting).

Run: python3 tools/gen_diff_golden.py > src/test/resources/diff_golden.json
"""
import difflib
import json


def lines(text):
    return text.splitlines(keepends=True)


CASES = []


def case(name, a, b, n=3):
    CASES.append({
        "name": name,
        "a": a,
        "b": b,
        "n": n,
        "diff": list(difflib.unified_diff(lines(a), lines(b),
                                          "a/file", "b/file", n=n)),
    })


base = "".join("line %02d\n" % i for i in range(1, 21))

case("replace one line",
     base, base.replace("line 07\n", "LINE SEVEN\n"))

case("insert lines",
     base, base.replace("line 10\n", "line 10\nextra A\nextra B\n"))

case("delete lines",
     base, base.replace("line 04\nline 05\n", ""))

case("two hunks far apart",
     base,
     base.replace("line 02\n", "Line 02\n")
         .replace("line 18\n", "Line 18\n"))

case("adjacent changes merge into one hunk",
     base,
     base.replace("line 08\n", "Line 08\n")
         .replace("line 12\n", "Line 12\n"))

case("boundary gap exactly 2n+1 splits",
     base,
     base.replace("line 05\n", "x\n").replace("line 13\n", "y\n"))

case("change at start", base, "FIRST\n" + base[len("line 01\n"):])

case("change at end", base, base[:-len("line 20\n")] + "LAST\n")

case("no trailing newline on last changed line",
     "alpha\nbeta\ngamma", "alpha\nbeta\nGAMMA")

case("empty diff", base, base)

case("empty a", "", "one\ntwo\n")

case("empty b", "one\ntwo\n", "")

case("n=0 no context", base, base.replace("line 09\n", "nine\n"), n=0)

case("n=1 context", base, base.replace("line 09\n", "nine\n"), n=1)

# >= 200 lines triggers autojunk: elements occurring more than
# len(b)//100 + 1 times are dropped from the match index (matched only
# via extension), changing hunk shapes vs the naive LCS
popular = ("X\n" * 5).join("block %02d\n" % i for i in range(40))
pop_b = popular.replace("block 17\n", "BLOCK 17\n")
assert len(lines(popular)) >= 200
case("autojunk popular pruning", popular, pop_b)

# repeated ambiguous lines: pins the matcher's earliest-longest choice
amb = "a\nb\na\nb\na\nb\nc\n"
case("ambiguous repeats", amb, "b\na\nb\na\nc\nd\n")

# interleaved moves (classic worst case for greedy matchers)
case("interleaved", "1\n2\n3\n4\n5\n6\n7\n8\n",
     "2\n4\n6\n8\n1\n3\n5\n7\n")

print(json.dumps(CASES, indent=1))
