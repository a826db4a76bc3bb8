"""CLI flag-surface compatibility: the reference's documented command
lines parse unchanged."""
import sys

from simhand_tpu.experiments.cli import get_general_args


def parse(argv):
    old = sys.argv
    sys.argv = ["main.py"] + argv
    try:
        return get_general_args()
    finally:
        sys.argv = old


def test_reference_readme_command_parses():
    # README.md:55-76 of the reference (simhand_w full pre-train)
    args = parse([
        "--experiment_type", "simhand_w",
        "--weight_type", "linear", "--diff_type", "mpjpe",
        "--pos_neg", "pos_neg", "--joints_type", "original",
        "--crop", "--resize", "--rotate", "--color_jitter",
        "-sources", "ego4d", "-sources", "100doh",
        "--datasets_scale", "2m",
        "-batch_size", "8192", "-epochs", "100", "-resnet_size", "50",
        "-accumulate_grad_batches", "2", "-lr", "0.0001",
        "-optimizer", "LARS", "-num_workers", "24",
        "-save_top_k", "3", "-tag", "run1", "--gpus", "0,1",
    ])
    assert args.experiment_type == "simhand_w"
    assert args.sources == ["ego4d", "100doh"]
    assert args.batch_size == 8192
    assert args.crop and args.rotate and args.color_jitter
    assert args.optimizer == "LARS"
    assert args.tag == ["run1"]


def test_broken_reference_alias_accepted():
    # README documents handclr_w although the reference's get_model
    # crashes on it (SURVEY §2.11) — we accept and alias it.
    args = parse(["--experiment_type", "handclr_w", "--use_pca"])
    assert args.experiment_type == "handclr_w"
    assert args.use_pca


def test_nonlinear_weight_flags():
    args = parse([
        "--weight_type", "non_linear",
        "--non_linear_lambda_pos", "2.5",
        "--non_linear_lambda_neg", "0.01",
    ])
    assert args.non_linear_lambda_pos == 2.5
    assert args.non_linear_lambda_neg == 0.01


def test_bn_variant_flag():
    args = parse(["--experiment_type", "simclr", "--bn_variant", "stop_grad"])
    assert args.bn_variant == "stop_grad"
    assert parse(["--experiment_type", "simclr"]).bn_variant == "exact"
