"""tempeh_parser_ray — a Ray-Data-native main-content extraction engine.

A from-scratch re-implementation of the capabilities of the reference
``tempeh-parser`` (a streaming Node.js HTML parser) as a distributed
Ray Data pipeline over Common-Crawl-style Parquet tables:

* ``core``      — byte-identical single-document lexer / tree builder /
                  text extractor (pure Python, no Ray dependency).
* ``stages``    — Ray ``map_batches`` stages (parser actor pool,
                  extraction, byte-size-aware rebatching).
* ``sources``   — corpus builders (fixture corpus, deterministic
                  synthetic Common-Crawl-style corpus).
* ``pipelines`` — end-to-end extraction DAG with checkpointed Parquet
                  output, per-partition lineage and resume.
* ``functions`` — large-scale training-data ops: dedup (exact, MinHash
                  LSH, SimHash, n-gram Jaccard), similarity search,
                  text analysis, multimodal stubs.
* ``state``     — lineage / checkpoint records.
"""

from .core.api import HTMLParser, ParserOptions  # noqa: F401

__version__ = "0.1.0"
