from lynx_spark.functions.text import (  # noqa: F401
    LANG_MARKERS,
    STOPWORDS,
    with_fingerprint,
    with_language,
    with_text_stats,
)
