from rustserini_spark.analysis.analyzer import (  # noqa: F401
    analyze_col,
    analyze_text,
    analyze_udf,
    simple_tokenize_text,
    simple_tokens_col,
)
from rustserini_spark.analysis.porter import porter_stem  # noqa: F401
from rustserini_spark.analysis.stopwords import LUCENE_ENGLISH_STOPWORDS  # noqa: F401
