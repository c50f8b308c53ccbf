"""Top-level library API (the analogue of the reference's import surface,
``tests/utils.py:51-61``: build extractor → call extract() directly).

    import ray, ray.data
    from video_features_ray.api import extract, get_spec, read_sequences

    ray.init(address="local")
    ds = read_sequences("/data/sequences/*.parquet")
    feats = extract(ds, get_spec("i3d_like_default"))   # lazy Dataset
    feats.write_parquet("/out/i3d")

All entry points return lazy Datasets; callers own the Ray session.
"""

from .functions.bpe import BpeTokenizer, bpe_tokenize, train_bpe
from .functions.sketches import (
    HyperLogLog,
    approx_distinct,
    bottom_k_sample,
    token_frequencies,
)
from .functions.flowviz import flow_to_rgb, make_colorwheel
from .pipelines.extract import extract
from .pipelines.queries import Q_FLOW, Q_FPS10, Q_TOTAL5, Q_W1, Q_W2
from .sources.sequences import (
    read_sequences,
    sequences_from_documents,
    synthetic_sequences,
    synthetic_sequences_table,
    tokenize_documents,
)
from .specs import SPECS, EncoderSpec, get_spec
from .sources.sinks import namespaced_dir, skip_existing, write_entity_files
from .stages.asof import asof_join, asof_join_broadcast
from .stages.deadletter import isolating, split_deadletters
from .stages.dedup import (
    embedding_neardup_candidates,
    exact_dedup,
    minhash_lsh_candidates,
)
from .stages.events import forward_fill, lag_lead, sessionize, transform_buckets
from .stages.joins import broadcast_join, partial_agg, tumbling_aggregate
from .stages.prep import (
    clamp_quantize,
    clean_text,
    pad_truncate,
    summarize_features,
    topk_predictions,
    validate_sequences,
)
from .stages.similarity import build_ivf_codebook, cosine_topk, ivf_assign, ivf_topk
from .stages.skew import salt_repartition, split_giant_sequences
from .state.checkpoint import Manifest, plan_partitions, run_checkpointed

__all__ = [
    "extract", "read_sequences", "sequences_from_documents", "tokenize_documents",
    "synthetic_sequences", "synthetic_sequences_table",
    "SPECS", "EncoderSpec", "get_spec",
    "asof_join", "asof_join_broadcast",
    "lag_lead", "sessionize", "forward_fill", "transform_buckets",
    "broadcast_join", "partial_agg", "tumbling_aggregate",
    "exact_dedup", "minhash_lsh_candidates", "embedding_neardup_candidates",
    "cosine_topk", "ivf_assign", "ivf_topk", "build_ivf_codebook",
    "salt_repartition", "split_giant_sequences",
    "run_checkpointed", "plan_partitions", "Manifest",
    "Q_W1", "Q_W2", "Q_TOTAL5", "Q_FPS10", "Q_FLOW",
    "train_bpe", "BpeTokenizer", "bpe_tokenize",
    "flow_to_rgb", "make_colorwheel",
    "write_entity_files", "skip_existing", "namespaced_dir",
    "isolating", "split_deadletters",
    "pad_truncate", "clean_text", "clamp_quantize",
    "topk_predictions", "summarize_features", "validate_sequences",
    "HyperLogLog", "approx_distinct", "bottom_k_sample", "token_frequencies",
]
