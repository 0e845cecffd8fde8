"""Dataset -> ordered stain list registry (ref: madeleine/datasets/modalities.py:1-3).

HE is always index 0 (HE_POSITION); extend by registering new cohorts here or
via `register_modalities`.
"""

from madeleine_tpu.config import MODALITY_DICTS as modality_dicts  # noqa: F401


def register_modalities(dataset: str, stains: list) -> None:
    if not stains or stains[0] != "HE":
        raise ValueError("modality lists must start with 'HE' (HE_POSITION=0)")
    modality_dicts[dataset] = list(stains)
