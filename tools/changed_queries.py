#!/usr/bin/env python3
"""Derive the query names affected by a git diff, for the scoped sf0.1
oracle replay (round-9 verdict #5: the full sf0.1 DuckDB compare takes
60-90 min, so each round replays only the rows it touched).

Usage:
    tools/changed_queries.py [BASE_REF]          # default HEAD~1
    # then:
    sbt "runMain graft.Verify /root/testdata/sf0.1 /tmp/replay $(tools/changed_queries.py BASE)"
    python3 tools/validate.py /root/testdata/sf0.1 /tmp/replay

Resolution is FILE-level and transitive, deliberately conservative:
 1. each query in SparkEntry.queries maps to the operator objects its
    builder references (parsed from SparkEntry.scala);
 2. each graft source file maps to the graft files it references
    (imports + fully-qualified uses), transitively — so a change to
    functions/TextHashes.scala selects every query whose operator
    (transitively) uses it;
 3. a change to SparkEntry.scala / OracleSql.scala selects the query
    names appearing in those files' diff hunks.
Over-selection costs replay minutes; under-selection would ship an
unvalidated row — so ties break toward selecting.
"""
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SRC = REPO / "src/main/scala"  # ALL main sources: the graftbridge
# shim lives outside graft/, and a Bridge change dirties every kernel
MAIN = SRC / "graft"


def sh(*args):
    return subprocess.run(args, cwd=REPO, capture_output=True,
                          text=True, check=True).stdout


def query_objects():
    """query name -> set of graft object simple names used in its builder."""
    src = (MAIN / "SparkEntry.scala").read_text()
    block = src[src.index("def queries"):src.index("def oracleSql")]
    out = {}
    # entries are '"name" -> (<expr>)' possibly spanning lines; split on
    # the '"name" ->' anchors
    parts = re.split(r'"([a-z0-9_]+)"\s*->', block)
    for name, expr in zip(parts[1::2], parts[2::2]):
        out[name] = set(re.findall(r"\b([A-Z][A-Za-z0-9]+)\s*\.", expr))
    return out


def file_objects():
    """graft source file -> set of object simple names it defines."""
    defs = {}
    for f in SRC.rglob("*.scala"):
        names = set(re.findall(r"\bobject\s+([A-Za-z0-9]+)", f.read_text()))
        defs[f] = names
    return defs


def file_refs(defs):
    """file -> set of graft FILES it references (by defined-object name)."""
    owner = {}
    for f, names in defs.items():
        for n in names:
            owner.setdefault(n, set()).add(f)
    refs = {}
    for f in defs:
        text = f.read_text()
        used = set(re.findall(r"\b([A-Z][A-Za-z0-9]+)[.(]", text))
        refs[f] = {g for n in used & set(owner) for g in owner[n] if g != f}
    return refs


def closure(files, refs):
    """files + everything that (transitively) DEPENDS ON nothing — we need
    the REVERSE: which files are dirtied by a change = files whose
    reference closure contains a changed file."""
    dirty = set(files)
    changed = True
    while changed:
        changed = False
        for f, rs in refs.items():
            if f not in dirty and rs & dirty:
                dirty.add(f)
                changed = True
    return dirty


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    diff = sh("git", "diff", "--name-only", base, "HEAD",
              "--", "src/main/scala").split()
    changed = {REPO / p for p in diff if p.endswith(".scala")}
    if not changed:
        return
    defs = file_objects()
    refs = file_refs(defs)
    dirty = closure(changed & set(defs), refs)
    qobjs = query_objects()
    obj_dirty = {n for f in dirty for n in defs.get(f, ())}
    selected = {q for q, objs in qobjs.items() if objs & obj_dirty}
    # a builder whose text resolves to NO known graft object (e.g. it
    # calls a bare imported member, which the `Object.member` regex can't
    # see) is unmappable — select it unconditionally, because silently
    # under-selecting is exactly the unvalidated-row failure the
    # docstring says ties must break against
    known = {n for names in defs.values() for n in names}
    selected |= {q for q, objs in qobjs.items() if not (objs & known)}
    # names touched in the contract/oracle files' hunks
    for contract in ("SparkEntry.scala", "OracleSql.scala"):
        p = f"src/main/scala/graft/{contract}"
        if any(str(f).endswith(contract) for f in changed):
            hunks = sh("git", "diff", "-U0", base, "HEAD", "--", p)
            touched = set(re.findall(r'"([a-z0-9_]+)"', "\n".join(
                l for l in hunks.splitlines() if l[:1] in "+-")))
            selected |= touched & set(qobjs)
    print(",".join(sorted(selected)))


if __name__ == "__main__":
    main()
