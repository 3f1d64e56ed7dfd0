from cccatalog_spark.functions.json_merge import (  # noqa: F401
    jsonb_object_merge,
    strip_null_values,
    tags_distinct_union,
)
from cccatalog_spark.functions.licenses import (  # noqa: F401
    license_from_path,
    resolve_license_pair,
)
from cccatalog_spark.functions.popularity import (  # noqa: F401
    popularity_constant,
    standardized_popularity,
    zero_guard,
)
from cccatalog_spark.functions.sanitize import (  # noqa: F401
    bool_coerce,
    enforce_char_limit,
    int_coerce,
    sanitize_string,
)
from cccatalog_spark.functions.urls import strip_scheme, url_domain  # noqa: F401
