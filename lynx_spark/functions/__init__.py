from lynx_spark.functions.text import (  # noqa: F401
    LANG_MARKERS,
    STOPWORDS,
    strip_markup,
    with_fingerprint,
    with_language,
    with_markup_stripped,
    with_text_stats,
)
