from crawler_spark.functions.canonicalize import (  # noqa: F401
    canonicalize_url,
    canonicalize_urls_udf,
    url_host,
    with_canonical_url,
)
