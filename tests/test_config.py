"""Config single-sourcing: the reference constants must have exactly one home."""

from dmpfold2_tpu.config import FoldConfig, TrainConfig


def test_train_constants_single_source():
    from dmpfold2_tpu.train import dataset, step

    assert dataset.BATCH_SIZE == TrainConfig.batch_size
    assert dataset.MAXALNSZ == TrainConfig.max_aln_size
    assert dataset.DEF_CROPLEN == TrainConfig.crop_len
    assert step.MAX_ITERATIONS == TrainConfig.max_iterations
    assert step.REFINE_STEPS == TrainConfig.refine_steps


def test_fold_config_reference_defaults():
    # reference predict.py:26-28 defaults must survive config edits
    cfg = FoldConfig()
    assert cfg.iterations == 10
    assert cfg.minsteps == 100
    assert cfg.precision == "fp32"


def test_from_cli_args_roundtrip():
    import argparse

    ns = argparse.Namespace(iterations=3, minsteps=7, device=None,
                            template=None, model_weights="w.npz",
                            precision="bf16", dca_method=None, vgru_impl=None)
    cfg = FoldConfig.from_cli_args(ns)
    assert cfg.iterations == 3 and cfg.minsteps == 7
    assert cfg.weights_file == "w.npz"
    assert cfg.precision == "bf16"
    assert cfg.dca_method == "auto"  # None -> keep default
