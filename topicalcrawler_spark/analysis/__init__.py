"""Training-data pipeline analysis operators (task brief "beyond the
reference" surface): deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine), similarity search (brute-force +
LSH + IVF), text analysis (language-ID, quality, tokens, fingerprint),
and multimodal binary-column plumbing.

Everything here is built from JVM-side Catalyst expressions (arrays +
higher-order functions + md5-based hashing) so the hot path stays in
whole-stage codegen AND the exact same arithmetic is expressible in
ANSI SQL for the DuckDB oracle — hash parity via
``conv(substring(md5(x),1,15),16,10)`` == DuckDB
``CAST('0x'||substring(md5(x),1,15) AS BIGINT)`` (60-bit, positive).
"""

from .hashing import hash60_expr, shingles_expr, tokens_expr  # noqa: F401
