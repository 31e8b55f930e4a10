"""One-shot mechanical splitter: hbase_to_mongo_export_spark/queries.py
(43k lines, 592 registrations) → hbase_to_mongo_export_spark/queries/
package with thematic modules and ONE shared registry.

Zero behavior change by construction:
- every top-level statement is copied verbatim (source lines, not
  re-rendered AST), in original order within its destination module;
- non-registered statements (imports, registry infra, helpers) all go to
  `_core.py`, preserving order, with package-relative imports bumped one
  level (`from .functions` → `from ..functions`) — inline imports inside
  function bodies are bumped the same way via AST line detection;
- registered functions are bucketed by theme (registration-name keyword
  rules), big themes split into numbered parts, and re-exported from
  `__init__.py` so `registry.<fn_name>` attribute access keeps working;
- cross-module references between registered functions get explicit
  imports (cycles are asserted absent).

Kept in-repo as evidence that the split was mechanical; verified by the
unchanged 590-oracle mirror suite (tests/test_queries_oracle.py).
"""

from __future__ import annotations

import ast
import os
import re
import sys
from collections import OrderedDict

SRC = "/tmp/r5/queries_monolith_backup.py"
PKG = "/root/repo/hbase_to_mongo_export_spark/queries"

THEME_RULES: list[tuple[str, list[str]]] = [
    ("streaming", ["streaming_", "stream_", "session_window", "late_data",
                   "watermark", "restart", "upsert_serving"]),
    ("multimodal", ["image_", "audio_", "wav_", "ppm_", "multimodal",
                    "frame_", "dhash", "media_"]),
    ("dedup", ["dedup_", "minhash", "simhash", "winnow", "ppjoin",
               "fingerprint", "shingle", "decontamination", "cdc_chunk",
               "chunk_dedup", "near_dup", "exact_dup", "substring_dup"]),
    ("similarity", ["similarity_", "embedding_", "knn_", "ivf", "pq_",
                    "ann_", "lsh_", "vector_", "cosine_pairs", "tfidf",
                    "centroid", "kmeans"]),
    ("graph", ["graph_", "pagerank", "triangle", "kcore", "bfs_", "sssp",
               "label_prop", "component", "assortativity", "hyperanf",
               "neighborhood_function"]),
    ("text", ["text_", "token", "bpe_", "lang_", "bm25", "rake_",
              "readability", "keyphrase", "ngram_", "pmi_", "zipf",
              "vocab", "stopword", "bleu", "texttiling", "unigram",
              "bigram", "lexical", "rouge", "edit_distance", "soundex",
              "morpheme", "hapax", "collocation", "kneser", "perplexity",
              "naive_bayes_lang"]),
    ("corpus", ["corpus", "c4_", "gopher", "dsir", "curriculum",
                "mixture", "train_val", "packing", "quality_",
                "contamination", "pii_", "doc_", "document_"]),
    ("windows", ["window_", "sessionize", "running_", "lag_lead",
                 "cumulative", "rolling_", "topk_per", "rank_",
                 "frame_rows", "gap_fill", "densif", "asof", "range_join",
                 "time_bucket", "calendar", "resample", "bars_"]),
    ("relational", ["q1_", "q2_", "q3_", "q5_", "q7_", "q9_", "q10_",
                    "q11_", "q16_", "q17_", "q18_", "q19_", "q20_",
                    "q22_", "join_", "agg_", "grouping", "set_ops",
                    "count_distinct", "percentile", "profile_", "pivot",
                    "unpivot", "rollup", "cube", "sample_", "sql_",
                    "string_functions", "json_", "xml_", "null_",
                    "bucketed", "broadcast", "skew", "sort_", "limit_",
                    "distinct_", "exists_", "lateral", "values_",
                    "intersect", "except_", "union_", "semi_", "anti_",
                    "ansi_", "decimal_", "interval_", "cast_", "try_",
                    "referential", "integrity", "events_", "latest_",
                    "orders_", "parts_", "supplier", "customer",
                    "nation", "region", "lineitem"]),
]

STAT_HINTS = [
    "test", "anova", "chi2", "regression", "ols_", "kalman", "cox_",
    "elo_", "arima", "garch", "arch_", "ewma", "cvar", "var_",
    "bootstrap", "bayes", "mcmc", "gibbs", "hmm_", "em_", "pca",
    "anomaly", "forecast", "seasonal", "survival", "hazard", "quantile",
    "entropy", "mutual_info", "correlation", "covariance", "skewness",
    "kurtosis", "gini", "theil", "lorenz", "herfindahl", "pareto",
]


def theme_of(reg_name: str) -> str:
    for theme, keys in THEME_RULES:
        for k in keys:
            if k in reg_name:
                return theme
    return "stats"


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # ---- block extraction: each top-level node owns the lines from the
    # previous node's end to its own end (attaches banners/comments)
    blocks = []
    prev_end = 0
    for node in tree.body:
        start = prev_end  # 0-based, inclusive
        end = node.end_lineno  # 1-based, inclusive
        text = "".join(lines[start:end])
        reg_names = []
        if isinstance(node, ast.FunctionDef):
            for dec in node.decorator_list:
                if (
                    isinstance(dec, ast.Call)
                    and isinstance(dec.func, ast.Name)
                    and dec.func.id in ("register", "register_demo")
                    and dec.args
                    and isinstance(dec.args[0], ast.Constant)
                ):
                    reg_names.append(dec.args[0].value)
        blocks.append(
            {
                "node": node,
                "text": text,
                "reg_names": reg_names,
                "start": start + 1,
            }
        )
        prev_end = end

    trailer = "".join(lines[prev_end:])

    # ---- bump relative imports one level (module → package member).
    def bump_relative_imports(block_text: str, node) -> str:
        # find ImportFrom nodes with level>=1 anywhere inside the node,
        # rewrite those exact lines
        rel_lines = set()
        for sub in ast.walk(node):
            if isinstance(sub, ast.ImportFrom) and sub.level and sub.level >= 1:
                rel_lines.add(sub.lineno)
        if not rel_lines:
            return block_text
        base = node.lineno  # block text offset mapping
        out = block_text.splitlines(keepends=True)
        # map absolute line -> index in out: block starts at blocks start
        # (which includes leading comments); compute offset
        first_abs = None
        # the text begins at block['start']; recompute per call via attr
        first_abs = block_start_abs[id(node)]
        for abs_ln in rel_lines:
            idx = abs_ln - first_abs
            out[idx] = re.sub(r"from \.(?=\w)", "from ..", out[idx], count=1)
        return "".join(out)

    block_start_abs = {id(b["node"]): b["start"] for b in blocks}

    # ---- import-time order dependencies: module-level assigns (and a few
    # registered fns) read _ORACLES["..."] of EARLIER registrations to
    # compose oracle SQL. Those blocks — plus everything referencing the
    # names they define — go to a final `composed` module imported last,
    # in original order, so the keys are always populated first.
    def reads_registry(node) -> bool:
        for sub in ast.walk(node):
            if (
                isinstance(sub, ast.Subscript)
                and isinstance(sub.value, ast.Name)
                and sub.value.id in ("_ORACLES", "_QUERIES")
                and isinstance(sub.slice, ast.Constant)
            ):
                return True
        return False

    deferred_ids = set()
    deferred_names: set[str] = set()
    changed = True
    while changed:
        changed = False
        for b in blocks:
            node = b["node"]
            if id(node) in deferred_ids:
                continue
            refs = {
                n.id for n in ast.walk(node) if isinstance(n, ast.Name)
            }
            if reads_registry(node) or (refs & deferred_names):
                deferred_ids.add(id(node))
                if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
                    deferred_names.add(node.name)
                elif isinstance(node, ast.Assign):
                    for t in node.targets:
                        if isinstance(t, ast.Name):
                            deferred_names.add(t.id)
                changed = True

    # ---- classify
    core_blocks = []
    fn_blocks = []  # (theme, defname, reg_names, text)
    composed_blocks = []  # original order
    for b in blocks:
        node = b["node"]
        text = bump_relative_imports(b["text"], node)
        if id(node) in deferred_ids:
            composed_blocks.append((node, text))
        elif b["reg_names"]:
            theme = theme_of(b["reg_names"][0])
            fn_blocks.append((theme, node.name, b["reg_names"], text))
        else:
            core_blocks.append((node, text))

    # ---- _core __all__: every top-level name defined or imported
    core_names = []
    for node, _ in core_blocks:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            core_names.append(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                for sub in ast.walk(t):
                    if isinstance(sub, ast.Name):
                        core_names.append(sub.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            core_names.append(node.target.id)
        elif isinstance(node, ast.Import):
            for a in node.names:
                core_names.append((a.asname or a.name).split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                core_names.append(a.asname or a.name)
    core_names = list(OrderedDict.fromkeys(core_names))

    # ---- theme ordering + part splitting (target <= MAX_LINES per file)
    MAX_LINES = 5500
    theme_order = [t for t, _ in THEME_RULES] + ["stats"]
    modules: list[tuple[str, list[tuple[str, str, list[str]]]]] = []
    for theme in theme_order:
        fns = [(d, t, r) for th, d, r, t in fn_blocks if th == theme]
        if not fns:
            continue
        parts, cur, cur_lines = [], [], 0
        for d, t, r in fns:
            n = t.count("\n")
            if cur and cur_lines + n > MAX_LINES:
                parts.append(cur)
                cur, cur_lines = [], 0
            cur.append((d, t, r))
            cur_lines += n
        if cur:
            parts.append(cur)
        for i, part in enumerate(parts):
            name = theme if len(parts) == 1 else f"{theme}_p{i + 1}"
            modules.append((name, part))

    # ---- cross-module references between registered defs
    def_to_mod = {}
    for mname, part in modules:
        for d, _, _ in part:
            def_to_mod[d] = mname
    for node, _ in composed_blocks:
        if isinstance(node, ast.FunctionDef):
            def_to_mod[node.name] = "composed"
    cross_imports: dict[str, set[tuple[str, str]]] = {}

    def note_refs(mod: str, node) -> None:
        refs = {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}
        for other in refs & set(def_to_mod):
            omod = def_to_mod[other]
            if omod != mod and other != getattr(node, "name", None):
                cross_imports.setdefault(mod, set()).add((omod, other))

    for theme, d, regs, text in fn_blocks:
        note_refs(def_to_mod[d], ast.parse(text))
    for node, text in composed_blocks:
        note_refs("composed", node)
    # assert no mutual cycles
    for mod, deps in cross_imports.items():
        for omod, _ in deps:
            assert not any(
                m2 == mod for (m2, _) in cross_imports.get(omod, set())
            ), f"cyclic cross-import {mod} <-> {omod}"

    # ---- write package
    os.makedirs(PKG, exist_ok=True)
    # _core.py
    with open(os.path.join(PKG, "_core.py"), "w") as f:
        for node, text in core_blocks:
            f.write(text)
        f.write(trailer)
        f.write("\n\n__all__ = [\n")
        for n in core_names:
            f.write(f"    {n!r},\n")
        f.write("]\n")

    # composed goes last: its import-time _ORACLES reads need every other
    # module's registrations already applied
    if composed_blocks:
        comp_defs = [
            n.name for n, _ in composed_blocks if isinstance(n, ast.FunctionDef)
        ]
        with open(os.path.join(PKG, "composed.py"), "w") as f:
            f.write(
                '"""Composed-oracle queries: these interpolate the oracle '
                "SQL of earlier\nregistrations (reading _ORACLES at import "
                "time), so they live in the one\nmodule imported last. "
                'Mechanically split by tools/split_queries.py."""\n\n'
                "from ._core import *  # noqa: F401,F403\n"
            )
            for omod, oname in sorted(cross_imports.get("composed", ())):
                f.write(f"from .{omod} import {oname}  # noqa: E402\n")
            f.write("\n")
            for _, t in composed_blocks:
                f.write(t)
            f.write("\n\n__all__ = [\n")
            for d in comp_defs:
                f.write(f"    {d!r},\n")
            f.write("]\n")

    mod_names = []
    for mname, part in modules:
        mod_names.append(mname)
        with open(os.path.join(PKG, f"{mname}.py"), "w") as f:
            f.write(
                f'"""{mname} queries (mechanically split from the original '
                'queries.py monolith\nby tools/split_queries.py; bodies '
                'verbatim, shared registry in _core)."""\n\n'
                "from ._core import *  # noqa: F401,F403\n"
            )
            for omod, oname in sorted(cross_imports.get(mname, ())):
                f.write(f"from .{omod} import {oname}  # noqa: E402\n")
            f.write("\n")
            for d, t, r in part:
                f.write(t)
            f.write("\n\n__all__ = [\n")
            for d, _, _ in part:
                f.write(f"    {d!r},\n")
            f.write("]\n")

    with open(os.path.join(PKG, "__init__.py"), "w") as f:
        # module docstring = the original monolith's docstring block
        first_node, first_text = core_blocks[0]
        if isinstance(first_node, ast.Expr):
            f.write(first_text)
        f.write("\nfrom ._core import *  # noqa: F401,F403,E402\n")
        for m in mod_names:
            f.write(f"from .{m} import *  # noqa: F401,F403,E402\n")
        if composed_blocks:
            f.write("from .composed import *  # noqa: F401,F403,E402\n")

    print(f"wrote {len(mod_names)} theme modules + _core + __init__")
    for m, part in modules:
        nl = sum(t.count("\n") for _, t, _ in part)
        print(f"  {m}: {len(part)} fns, ~{nl} lines")


if __name__ == "__main__":
    main()
