"""Framework constants (parity with reference config.py + monolith constants)."""
import os

APP_NAME = "hevc_tpu"
APP_VERSION = "0.1.0"

LOG_FILE = "transcode_log.csv"
CSV_FIELDS = ["file", "status", "quality", "retries", "method", "hdr"]

# input extension set (reference apple_hevc_batch.py:33-36, 17 entries)
INPUT_EXTS = (".mp4", ".mkv", ".mov", ".avi", ".wmv", ".flv", ".webm",
              ".m4v", ".ts", ".m2ts", ".mts", ".vob", ".3gp", ".mpg",
              ".mpeg", ".rm", ".rmvb",
              # native raw ingest (new in the TPU framework)
              ".y4m")

DEFAULT_CRF = 18

_cpu = os.cpu_count() or 4
MAX_WORKERS_SDR = _cpu
MAX_WORKERS_HDR = 2
CLI_MAX_WORKERS_SDR = min(_cpu, 8)
CLI_MAX_WORKERS_HDR = min(4, max(_cpu // 4, 1))

# per-stage timeouts (reference apple_hevc_batch.py:38-39, 229)
PROBE_TIMEOUT = 20
ENCODE_TIMEOUT = 3600
VALIDATOR_TIMEOUT = 300

# admission control thresholds (reference dynamic_workers thermal policy,
# apple_hevc_batch.py:837-858; here also used for host-memory headroom)
TEMP_HARD_C = 85
TEMP_SOFT_C = 70
