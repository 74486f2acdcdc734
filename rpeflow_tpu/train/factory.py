"""Dataset / model factories (reference factory.py:9-45)."""

from __future__ import annotations

from ..data import (
    ConcatDataset,
    DSECPreprocessTrain,
    DSECTrain,
    FlyingThings3D,
    FlyingThings3DEvent,
    KubricData,
)


def dataset_factory_single(cfgs):
    name = cfgs.name
    if name == "flyingthings3d":
        return FlyingThings3D(cfgs)
    if name == "flyingthings3devent":
        return FlyingThings3DEvent(cfgs)
    if name == "kubric":
        return KubricData(cfgs)
    if name == "dsectrain":
        return DSECTrain(cfgs)
    if name == "dsecpreprocesstrain":
        return DSECPreprocessTrain(cfgs)
    raise NotImplementedError(f"Unknown dataset: {name}")


def dataset_factory(cfgs):
    """Single dataset, or ConcatDataset of trainset1..3 (factory.py:24-37)."""
    if "trainset1" in cfgs:
        datasets = [dataset_factory_single(cfgs.trainset1)]
        if "trainset2" in cfgs:
            datasets.append(dataset_factory_single(cfgs.trainset2))
        if "trainset3" in cfgs:
            datasets.append(dataset_factory_single(cfgs.trainset3))
        return ConcatDataset(datasets)
    return dataset_factory_single(cfgs)


def model_factory(cfgs, dtype=None, amp=False):
    """Build the model. ``amp`` enables the selective-bf16 policy (safe on
    TPU); ``dtype`` forces a global compute dtype (whole-model bf16 is
    pathological on TPU — see RPEFlowCore.amp — and is intentionally NOT
    what YAML ``amp: true`` maps to)."""
    if cfgs.name == "RPEFlow":
        from ..model import DEFAULT_N_SAMPLES, RPEFlow

        if hasattr(cfgs, "pwc3d") and hasattr(cfgs.pwc3d, "knn_backend"):
            # 'auto' (approx_min_k on TPU) | 'exact' | 'approx'; measured
            # full-model metric deltas in PERF.md "Eval deviations" section
            from ..ops.knn import set_knn_backend

            set_knn_backend(
                str(cfgs.pwc3d.knn_backend),
                recall_target=getattr(cfgs.pwc3d, "knn_recall", None))
        n_samples = tuple(getattr(cfgs, "n_samples", DEFAULT_N_SAMPLES))
        return RPEFlow(cfgs=cfgs, dtype=dtype, n_samples_list=n_samples,
                       amp=amp)
    raise NotImplementedError(f"Unknown model name: {cfgs.name}")
