"""Text-prompted segmentation (the Lang-SAM role).

The reference composites edits under a text-prompted object mask produced by
GroundingDINO + SAM (/root/reference/gaussctrl/lang_sam.py). The mask
interface here is a plain callable so the pipeline is decoupled from any
particular segmenter (SURVEY.md §7.4.5):

    masker(images [V,H,W,3] in [0,1], text) -> masks [V,H,W,1] in [0,1]
"""

from gaussctrl_tpu.seg.masker import MaskProvider, NullMasker, ThresholdMasker
