"""Fused model-scoring stage: langid + perplexity in ONE Arrow crossing.

``with_language`` and ``with_perplexity`` each pay a full JVM->Arrow->
pandas->Arrow->JVM round trip over the text column.  The per-row kernel
work is small (batched numpy, functions/textcore.py), so on short
transcript turns the two crossings ARE the stage cost — fusing them
halves the Arrow serialization, the pandas Series construction, and the
Python-worker scheduling for the whole model block.  Outputs are
byte-identical to running the two stages separately (same broadcast
models, same kernels, same batch shapes).

The single-model stages remain available for pipelines that genuinely
need only one of the scores (and as the documented deployment shape for
swapping in a real fastText / KenLM model).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .langid import default_model as default_langid
from .perplexity import default_model as default_ppl
from .textcore import LangIdModel, PerplexityModel


def scoring_udf(
    spark: SparkSession,
    langid_model: LangIdModel | None = None,
    ppl_model: PerplexityModel | None = None,
):
    """text -> struct<lang, lang_score, ppl> iterator pandas UDF (both
    models broadcast once, deserialized once per worker task)."""
    lm = langid_model or default_langid()
    pm = ppl_model or default_ppl()
    bc_l = spark.sparkContext.broadcast(lm.to_bytes())
    bc_p = spark.sparkContext.broadcast(pm.to_bytes())

    @pandas_udf("lang string, lang_score double, ppl double")
    def _score(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        local_l = LangIdModel.from_bytes(bc_l.value)
        local_p = PerplexityModel.from_bytes(bc_p.value)
        for series in batches:
            texts = [None if pd.isna(t) else t for t in series]
            langs, scores = local_l.predict(texts)
            ppls = local_p.score(texts)
            yield pd.DataFrame(
                {"lang": langs, "lang_score": scores, "ppl": ppls}
            )

    return _score


def with_model_scores(
    df: DataFrame,
    text_col: str = "text",
    langid_model: LangIdModel | None = None,
    ppl_model: PerplexityModel | None = None,
) -> DataFrame:
    """Add ``lang``, ``lang_score``, ``ppl`` in one Arrow round trip."""
    udf = scoring_udf(df.sparkSession, langid_model, ppl_model)
    tmp = "__scores"
    df = df.withColumn(tmp, udf(F.col(text_col)))
    return df.withColumns(
        {
            "lang": F.col(f"{tmp}.lang"),
            "lang_score": F.col(f"{tmp}.lang_score"),
            "ppl": F.col(f"{tmp}.ppl"),
        }
    ).drop(tmp)
