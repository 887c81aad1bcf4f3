"""One-shot refactor: split plans/extensions.py (11k lines) into a package
of family modules (VERDICT r5 "Next round" #4), preserving every public
import path via the package __init__.

Mechanics: parse top-level segments (def / assign, with their leading
comments), classify each query function xNN_*/yN_* by a hand-written
family map, let its XNN_SQL constants and _XNN_* helpers follow the same
number, then fix-point hoist anything referenced across family boundaries
into _shared.py so family modules only ever import from ._shared (no
cross-family imports, no cycles). Segment order inside each module is the
original file order, so definition-time references (f-string SQL built
from earlier constants) keep working.

Run from repo root: python tools/split_extensions.py
Writes shifts_etl_spark/plans/extensions/ and deletes extensions.py.
"""

from __future__ import annotations

import ast
import re
from collections import defaultdict
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SRC = ROOT / "shifts_etl_spark" / "plans" / "extensions.py"
PKG = ROOT / "shifts_etl_spark" / "plans" / "extensions"

FAMILIES = ("dedup", "ann", "text", "curation", "analytics", "evalstats")

# family per query number (x1..x227, y1..y7)
_F = {}
def _assign(fam, nums):
    for n in nums:
        _F[n] = fam

_assign("dedup", ["x1", "x2", "x3", "x4", "x5", "x6", "x25", "x27", "x29",
                  "x35", "x36", "x43", "x51", "x60", "x66", "x67", "x68",
                  "x79", "x83", "x84", "x85", "x86", "x87", "x93", "x98",
                  "x99", "x106", "x130", "x148", "x178", "x187", "x190",
                  "x197", "x217", "x223", "x225", "y4"])
_assign("ann", ["x7", "x8", "x13", "x30", "x42", "x44", "x49", "x54", "x59",
                "x89", "x95", "x105", "x121", "x124", "x129", "x140", "x144",
                "x185", "x199", "x209", "x215", "x220", "y2", "y3", "y5",
                "y6"])
_assign("text", ["x9", "x10", "x11", "x16", "x17", "x19", "x28", "x37",
                 "x38", "x39", "x45", "x52", "x56", "x69", "x74", "x75",
                 "x94", "x96", "x102", "x114", "x115", "x131", "x135",
                 "x139", "x146", "x157", "x159", "x163", "x169", "x188",
                 "x210", "y1"])
_assign("curation", ["x12", "x18", "x20", "x21", "x22", "x23", "x24", "x26",
                     "x34", "x40", "x46", "x50", "x53", "x61", "x71", "x72",
                     "x73", "x76", "x82", "x88", "x90", "x91", "x92", "x97",
                     "x103", "x123", "x132", "x150", "x152", "x158", "x162",
                     "x171", "x173", "x174", "x176", "x177", "x200", "x203",
                     "x219", "x222", "x226", "x227", "y7"])
_assign("analytics", ["x47", "x57", "x62", "x65", "x80", "x81", "x101",
                      "x107", "x108", "x109", "x110", "x111", "x112", "x116",
                      "x117", "x118", "x119", "x120", "x122", "x125", "x126",
                      "x127", "x128", "x133", "x134", "x136", "x138", "x142",
                      "x143", "x145", "x149", "x151", "x153", "x154", "x155",
                      "x161", "x164", "x165", "x166", "x172", "x175", "x179",
                      "x181", "x182", "x183", "x184", "x189", "x192", "x193",
                      "x194", "x195", "x196", "x198", "x201", "x202", "x204",
                      "x205", "x207", "x208", "x213", "x214", "x221", "x224"])
_assign("evalstats", ["x14", "x15", "x31", "x32", "x33", "x41", "x48", "x55",
                      "x58", "x63", "x64", "x70", "x77", "x78", "x100",
                      "x104", "x113", "x137", "x141", "x147", "x156", "x160",
                      "x167", "x168", "x170", "x180", "x186", "x191", "x206",
                      "x211", "x212", "x216", "x218"])

NUM_RE = re.compile(r"^_?([xyXY]\d+)(?:_|$)")


def seg_number(name: str) -> str | None:
    m = NUM_RE.match(name)
    return m.group(1).lower() if m else None


def main() -> None:
    src = SRC.read_text()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # --- segment the file ------------------------------------------------
    segs = []  # (names, start0, end0) 0-based line spans incl leading comments
    prev_end = 0
    header_end = None
    for node in tree.body:
        start = node.lineno - 1
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and node.decorator_list:
            start = min(start, min(d.lineno for d in node.decorator_list) - 1)
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            names = [node.name]
        elif isinstance(node, ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
        else:
            names = []
        if header_end is None and names:
            header_end = prev_end  # everything before first def/assign
        # attach the comment/blank gap above to this segment
        gap = prev_end
        if header_end is not None:
            start = gap
        segs.append({"names": names, "start": start, "end": node.end_lineno,
                     "node": node})
        prev_end = node.end_lineno
    # header = import block between the module docstring and the first
    # def/assign (the docstring itself is replaced per-module so that
    # `from __future__` stays the first statement after it)
    first_def = next(s for s in segs if s["names"])
    doc_end = 0
    if (tree.body and isinstance(tree.body[0], ast.Expr)
            and isinstance(tree.body[0].value, ast.Constant)):
        doc_end = tree.body[0].end_lineno
    header = "".join(lines[doc_end: first_def["start"]])
    # the package is one level deeper than the old module: `..` -> `...`
    header = re.sub(r"^from \.\.", "from ...", header, flags=re.M)

    # --- name -> defining segment ----------------------------------------
    def_seg = {}
    for s in segs:
        for n in s["names"]:
            def_seg[n] = id(s)
    by_id = {id(s): s for s in segs}

    # --- references per segment ------------------------------------------
    for s in segs:
        refs = set()
        for sub in ast.walk(s["node"]):
            if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load):
                refs.add(sub.id)
        s["refs"] = {r for r in refs if r in def_seg and def_seg[r] != id(s)}

    # --- initial family assignment ----------------------------------------
    for s in segs:
        fam = None
        for n in s["names"]:
            num = seg_number(n)
            if num and num in _F:
                fam = _F[num]
                break
        if s["names"] and s["names"][0] == "EXTENSIONS":
            fam = "__init__"
        s["fam"] = fam  # None -> undecided helper/const

    # undecided: family of sole referencing family, else shared
    changed = True
    while changed:
        changed = False
        for s in segs:
            if s["fam"] is not None or not s["names"]:
                continue
            users = set()
            for t in segs:
                if t is s:
                    continue
                if t["refs"] & set(s["names"]):
                    users.add(t["fam"])
            users.discard("__init__")
            users = {u for u in users if u is not None}
            if len(users) == 1:
                s["fam"] = next(iter(users))
                changed = True
    for s in segs:
        if s["fam"] is None and s["names"]:
            s["fam"] = "_shared"

    # --- fixpoint hoist: anything referenced cross-family -> _shared ------
    changed = True
    while changed:
        changed = False
        for s in segs:
            if not s["names"]:
                continue
            for t in segs:
                if t is s or not (t["refs"] & set(s["names"])):
                    continue
                tf, sf = t["fam"], s["fam"]
                if tf == "__init__" or sf == "_shared":
                    continue
                if tf != sf:  # cross-family (incl _shared user of family name)
                    s["fam"] = "_shared"
                    changed = True
                    break

    # _t is monkeypatched in tests: force to _shared
    for s in segs:
        if "_t" in s["names"]:
            s["fam"] = "_shared"

    # --- emit --------------------------------------------------------------
    PKG.mkdir(exist_ok=True)
    mod_docs = {
        "_shared": "Imports, the `_t` table loader, and helpers/constants "
                   "used by more than one family module.",
        "dedup": "Exact / MinHash-LSH / SimHash / n-gram / embedding "
                 "near-dup detection, duplicate clusters and spans, "
                 "contamination, record linkage.",
        "ann": "Similarity search over the embeddings table: brute-force / "
               "LSH / IVF / PQ top-k, reranking, embedding geometry audits.",
        "text": "Text statistics, language ID, tokenization/BPE, "
                "vocabulary, n-gram language models.",
        "curation": "Sampling, splits, mixtures, quality filtering and "
                    "calibration, chunking/packing, multimodal plumbing, "
                    "privacy audits.",
        "analytics": "Product/event/commerce analytics over the TPC-H-ish "
                     "tables: funnels, retention, revenue, sessions, graph.",
        "evalstats": "Evaluation metrics, statistical tests, drift, "
                     "sketches, data-quality profiling.",
    }
    buckets = defaultdict(list)
    for s in segs:
        if s["names"]:
            buckets[s["fam"]].append(s)

    shared_names = sorted({n for s in buckets["_shared"] for n in s["names"]})

    def body(fam):
        text = "".join(
            "".join(lines[s["start"]:s["end"]]) for s in buckets[fam]
        )
        # inline relative imports inside function bodies deepen too
        return re.sub(r"from \.\.([a-z])", r"from ...\1", text)

    (PKG / "_shared.py").write_text(
        '"""' + mod_docs["_shared"] + '"""\n\n' + header + body("_shared")
    )
    for fam in FAMILIES:
        imports = sorted({
            r for s in buckets[fam] for r in s["refs"] if r in shared_names
        })
        imp = ""
        if imports:
            names = ",\n    ".join(imports)
            imp = f"from ._shared import (\n    {names},\n)\n\n"
        (PKG / f"{fam}.py").write_text(
            '"""' + mod_docs[fam] + '"""\n\n' + header + imp + body(fam)
        )

    init_lines = [
        '"""LLM-training-data pipeline queries (north-star extension ops,\n'
        "BASELINE.json) over documents / embeddings, with DuckDB oracles where\n"
        "the semantics are SQL-expressible. Split by operator family in round 6\n"
        "(VERDICT r5 #4); every name previously importable from the old\n"
        "plans/extensions module is re-exported here unchanged.\n"
        '"""\n',
        "from ._shared import *  # noqa: F401,F403",
        "from ._shared import _t  # noqa: F401  (tests monkeypatch via family modules)",
    ]
    for fam in FAMILIES:
        init_lines.append(f"from .{fam} import *  # noqa: F401,F403")
    init_lines.append(
        "\n# the family headers import operator modules (e.g. operators.dedup)\n"
        "# whose names leak through `import *` and would shadow the family\n"
        "# submodules on the package — rebind the submodules explicitly\n"
        "# (`from . import dedup` won't do: it short-circuits on the attr).\n"
        "import sys as _sys  # noqa: E402\n\n"
        + "\n".join(
            f'{m} = _sys.modules[__name__ + ".{m}"]'
            for m in ("_shared", *FAMILIES)
        )
    )
    init_lines.append("")
    init_lines.append(body("__init__"))
    (PKG / "__init__.py").write_text("\n".join(init_lines))

    SRC.unlink()
    for fam in ["_shared", *FAMILIES]:
        p = PKG / f"{fam}.py"
        print(f"{p.name}: {len(p.read_text().splitlines())} lines, "
              f"{len(buckets[fam])} segments")
    print(f"__init__.py: {len((PKG / '__init__.py').read_text().splitlines())} lines")
    print("shared names:", len(shared_names))


if __name__ == "__main__":
    main()
