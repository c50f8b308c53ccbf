"""video_features_ray — a Ray-Data-native windowed feature-engineering engine.

Built from scratch with the query/data-processing capabilities of the
reference repo ``v-iashin/video_features`` (read-only checkout at
``/root/reference``), re-expressed over Parquet tables of pre-tokenized
sequences ``(doc_id: string, tokens: list<int32>, n_tok: int32,
source: string)``.

Architecture (idiomatic Ray Data, NOT a port):

- ``sources/``   — parquet readers, deterministic synthetic corpus,
                   documents→sequences tokenizer.
- ``stages/``    — stateless window operators (W1 slide, W2 streaming
                   stack, lag/lead, two-level tumbling), stateful encoder
                   actor pools, per-entity event-stream operators
                   (sessionize, backfill, as-of join), dedup, similarity,
                   text analysis.
- ``pipelines/`` — composed end-to-end extraction pipelines.
- ``state/``     — per-partition checkpoint manifest + resume.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions
are owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
