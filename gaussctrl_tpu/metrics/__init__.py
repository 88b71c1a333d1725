"""Edit-quality metrics (the reference delegates these to instruct-nerf2nerf's
CLIP metrics code, /root/reference/README.md:160-161; vendored here)."""

from gaussctrl_tpu.metrics.clip_metrics import (
    CLIPScorer, clip_directional_similarity, clip_similarity,
)
