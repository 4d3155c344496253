from graphforge_spark.functions.terms import (  # noqa: F401
    expand_curie,
    is_iri,
    ntriples_line,
    object_term,
)
from graphforge_spark.functions.hashing import (  # noqa: F401
    md5_minhash_cols,
    portable_bucket,
)
from graphforge_spark.functions.text import (  # noqa: F401
    shingles,
    tokens,
)
