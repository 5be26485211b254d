"""Language identification for source code: keyword-profile heuristic.

A training-data-pipeline operator (north_star §extras): score each document
against per-language keyword profiles, pick the argmax.  Pure JVM column
expressions — at 10^12 files nothing per-row may touch Python.

The profiles are the same keyword sets the synthetic corpus generator draws
from plus file-extension evidence when a ``path`` column exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsh_search_go_spark.config import DedupConfig
from lsh_search_go_spark.functions.shingles import tokens_expr

# discriminative keywords only (shared ones like `return`/`if` carry no signal)
PROFILES = {
    "python": ["def", "import", "elif", "lambda", "self", "none", "class"],
    "go": ["func", "package", "range", "defer", "chan", "interface", "var"],
    "java": ["public", "static", "void", "extends", "implements", "final", "new"],
    "js": ["function", "const", "let", "=>", "var", "typeof", "undefined"],
    "c": ["int", "void", "struct", "sizeof", "typedef", "include", "while"],
}

EXT = {"py": "python", "go": "go", "java": "java", "js": "js", "c": "c", "h": "c"}


def duck_lang_id(content_sql: str, cfg: DedupConfig) -> str:
    """DuckDB mirror of the keyword-argmax fold (same language order, same
    tie-break: first max wins over the alphabetically-sorted profile list)."""
    from lsh_search_go_spark.functions.shingles import duck_tokens

    toks = duck_tokens(content_sql, cfg.lowercase, cfg.strip_comments)
    entries = []
    for lang, kws in sorted(PROFILES.items()):
        arr = "[" + ",".join(f"'{k}'" for k in kws) + "]"
        entries.append(
            f"{{'score': len(list_filter(list_distinct({toks}), "
            f"t -> list_contains({arr}, t))), 'lang': '{lang}'}}"
        )
    return (
        "list_reduce(list_prepend({'score': -1, 'lang': ''}, ["
        + ",".join(entries)
        + "]), (acc, s) -> case when s.score > acc.score then s else acc end).lang"
    )


def lang_id(df: DataFrame, cfg: DedupConfig, out_col: str = "lang_pred") -> DataFrame:
    """Adds ``lang_pred``: the language whose keyword profile overlaps the
    document's token set most (ties broken alphabetically; extension evidence
    from ``path`` wins when present and recognized)."""
    toks = tokens_expr(cfg.content_col, cfg.lowercase, cfg.strip_comments)
    scores = []
    for lang, kws in sorted(PROFILES.items()):
        arr = "array(" + ",".join(f"'{k}'" for k in kws) + ")"
        scores.append(
            f"named_struct('score', size(filter(array_distinct({toks}), "
            f"t -> array_contains({arr}, t))), 'lang', '{lang}')"
        )
    # array_max over structs orders by first field (score), tie-break needs
    # reversed lang for deterministic alphabetical preference on ties
    best = (
        "aggregate(array(" + ",".join(scores) + "), "
        "named_struct('score', -1, 'lang', ''), "
        "(acc, s) -> case when s.score > acc.score then s else acc end).lang"
    )
    out = df.withColumn("__kw_lang", F.expr(best))
    if "path" in df.columns:
        ext = F.element_at(F.split(F.col("path"), "\\."), -1)
        mapping = F.create_map(*[F.lit(x) for kv in EXT.items() for x in kv])
        out = out.withColumn(
            out_col, F.coalesce(mapping[ext], F.col("__kw_lang"))
        )
    else:
        out = out.withColumn(out_col, F.col("__kw_lang"))
    return out.drop("__kw_lang")
