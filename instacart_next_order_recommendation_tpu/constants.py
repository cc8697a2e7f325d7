"""Central paths, filenames, and magic strings.

Artifact filename/layout contracts match the reference implementation
(/root/reference/src/constants.py:1-93) so that datasets, eval artifacts, and
index caches are interchangeable between the two stacks.
"""

from __future__ import annotations

import os
from pathlib import Path

# Repository root (parent of the package directory)
PROJECT_ROOT = Path(__file__).resolve().parents[1]

# Environment variable names
ENV_FEEDBACK_DB_PATH = "FEEDBACK_DB_PATH"
ENV_MODEL_DIR = "MODEL_DIR"
ENV_CORPUS_PATH = "CORPUS_PATH"
ENV_API_KEY = "API_KEY"
ENV_RATE_LIMIT = "RATE_LIMIT"
ENV_MAX_CORPUS_UPLOAD_PRODUCTS = "MAX_CORPUS_UPLOAD_PRODUCTS"
ENV_CORPUS_HF_REPO = "CORPUS_HF_REPO"
ENV_CORPUS_HF_REPO_TYPE = "CORPUS_HF_REPO_TYPE"
ENV_INFERENCE_DEVICE = "INFERENCE_DEVICE"
# Micro-batching window for /recommend (milliseconds; 0/unset = off).
ENV_BATCH_WINDOW_MS = "BATCH_WINDOW_MS"
# Top-k extraction mode: "exact" (default) or "packed" (the ~20-bit packed
# score+index kernel for >=1M-row catalogs; scores quantized to ~3 decimal
# digits). Operator-flippable without source edits; also an inference.yaml key.
ENV_TOPK_EXTRACTION = "ITOR_TOPK_EXTRACTION"
# Top-k kernel dispatch override: "auto" (measured k~32 crossover, default),
# "blocked" (force the Pallas blocked kernel), "dense" (force scores+lax.top_k).
ENV_TOPK_DISPATCH = "ITOR_TOPK_DISPATCH"
# HTTP server bounds (the robustness knobs uvicorn provides the reference,
# /root/reference/Dockerfile:58-62): max concurrently-handled connections
# (excess gets a fast 503), per-connection socket timeout in seconds (slow
# clients cannot pin a worker), and max accepted request-body size in bytes
# (oversize gets 413 before the body is read).
ENV_HTTP_MAX_CONCURRENCY = "HTTP_MAX_CONCURRENCY"
ENV_HTTP_SOCKET_TIMEOUT = "HTTP_SOCKET_TIMEOUT"
ENV_HTTP_MAX_BODY_BYTES = "HTTP_MAX_BODY_BYTES"
DEFAULT_HTTP_MAX_CONCURRENCY = 64
DEFAULT_HTTP_SOCKET_TIMEOUT = 30.0
DEFAULT_HTTP_MAX_BODY_BYTES = 64 * 1024 * 1024  # corpus uploads are ~10s of MB

# Config files (YAML)
CONFIG_DIR = PROJECT_ROOT / "configs"
DEFAULT_CONFIG_DATA_PREP = CONFIG_DIR / "data_prep.yaml"
DEFAULT_CONFIG_TRAIN = CONFIG_DIR / "train.yaml"
DEFAULT_CONFIG_INFERENCE = CONFIG_DIR / "inference.yaml"
DEFAULT_CONFIG_BASELINES = CONFIG_DIR / "baselines.yaml"
DEFAULT_CONFIG_COMPARE = CONFIG_DIR / "compare_untrained_vs_trained.yaml"
DEFAULT_CONFIG_FEEDBACK_ANALYTICS = CONFIG_DIR / "feedback_analytics.yaml"
DEFAULT_CONFIG_GENERATE_SAMPLE_FEEDBACK = CONFIG_DIR / "generate_sample_feedback.yaml"
DEFAULT_CONFIG_UPLOAD_MODEL = CONFIG_DIR / "upload_model.yaml"
DEFAULT_CONFIG_UPLOAD_CORPUS = CONFIG_DIR / "upload_corpus.yaml"

# Data prep: input CSVs under data_dir; outputs under processed/<param_subdir>/
DEFAULT_DATA_DIR = PROJECT_ROOT / "data"
DEFAULT_PROCESSED_DIR = PROJECT_ROOT / "processed"

# Raw data filenames (Instacart Kaggle layout)
PRODUCTS_CSV = "products.csv"
AISLES_CSV = "aisles.csv"
DEPARTMENTS_CSV = "departments.csv"
ORDERS_CSV = "orders.csv"
ORDER_PRODUCTS_PRIOR_CSV = "order_products__prior.csv"
ORDER_PRODUCTS_TRAIN_CSV = "order_products__train.csv"

# Chunk size for streaming reads of order_products__prior.csv (~32M rows)
ORDER_PRODUCTS_CHUNK_SIZE = 500_000

# orders.csv eval_set column values
EVAL_SET_TRAIN = "train"
EVAL_SET_PRIOR = "prior"

# Processed output filenames (reference contract: src/constants.py:52-57)
EVAL_QUERIES_FILENAME = "eval_queries.json"
EVAL_CORPUS_FILENAME = "eval_corpus.json"
EVAL_RELEVANT_DOCS_FILENAME = "eval_relevant_docs.json"
DATA_PREP_PARAMS_FILENAME = "data_prep_params.json"
TRAIN_DATASET_SUBDIR = "train_dataset"
EVAL_DATASET_SUBDIR = "eval_dataset"

# Sample user contexts (demo / load generation; reference src/constants.py:60-66)
SAMPLE_USER_CONTEXTS = [
    "[+7d w4h14] Organic Milk, Whole Wheat Bread.",
    "[+3d w1h9] Banana, Greek Yogurt, Honey.",
    "[+14d w6h18] Chicken Breast, Broccoli, Rice.",
    "[+1d w0h12] Coffee, Oat Milk, Granola.",
    "[+5d w3h20] Pasta, Tomato Sauce, Parmesan.",
]

# Demo query used by CLI inference when no query is configured
DEMO_QUERY = "[+7d w4h14] Organic Milk, Whole Wheat Bread."

# Training outputs
DEFAULT_OUTPUT_DIR = PROJECT_ROOT / "models_out" / "two_tower"
FINAL_SUBDIR = "final"

# Serving defaults
DEFAULT_MODEL_DIR = DEFAULT_OUTPUT_DIR / FINAL_SUBDIR
DEFAULT_CORPUS_PATH = DEFAULT_PROCESSED_DIR / "p5_mp20_ef0.1" / EVAL_CORPUS_FILENAME

# Hugging Face fallback repo for the corpus (only used when hub access exists)
DEFAULT_CORPUS_HF_REPO = "chenbowen184/product-artifacts"
DEFAULT_CORPUS_HF_REPO_TYPE = "dataset"
DEFAULT_CORPUS_HF_FILENAME = "product_catalog_corpus_p5_mp20_ef0.1.json"
DEFAULT_QUERIES_HF_FILENAME = "product_queries_p5_mp20_ef0.1.json"

# Corpus upload limit for POST /admin/corpus
MAX_CORPUS_UPLOAD_PRODUCTS = 100_000

# Feedback store
DEFAULT_FEEDBACK_DB_PATH = PROJECT_ROOT / "data" / "feedback.db"

# Embedding index cache (under corpus parent dir; reference contract src/constants.py:88-92)
INDEX_SUBDIR = ".embedding_index"
MANIFEST_FILENAME = "manifest.json"
EMBEDDINGS_FILENAME = "embeddings.npy"
PRODUCT_IDS_FILENAME = "product_ids.json"

# Model/tokenizer checkpoint filenames (our own TPU-native format)
PARAMS_FILENAME = "params.msgpack"
MODEL_CONFIG_FILENAME = "model_config.json"
VOCAB_FILENAME = "vocab.txt"


def env_flag(name: str, default: bool = False) -> bool:
    """Read a boolean environment flag ("1"/"true"/"yes" are truthy)."""
    val = os.getenv(name)
    if val is None:
        return default
    return val.strip().lower() in ("1", "true", "yes", "on")
