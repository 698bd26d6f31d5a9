"""Chained-subcommand argv grammar tests (reference train.py:11-54 parity)."""

import pytest

from mono_depth_estimation_tpu.cli.common import (
    build_parser,
    derive_globals,
    parse_args_into_namespaces,
)


@pytest.fixture(scope="module")
def parser_commands():
    return build_parser("test")


def test_dataset_roles_and_method(parser_commands):
    parser, commands = parser_commands
    args = parse_args_into_namespaces(
        parser, commands,
        ["--name", "run1", "--max_epochs", "3",
         "nyu", "--path", "/data/nyu", "--training", "--validation",
         "bts", "--batch_size", "4", "--loss", "silma"],
    )
    assert args.globals.name == "run1"
    assert args.globals.max_epochs == 3
    assert len(args.training) == 1 and len(args.validation) == 1
    assert args.training[0][0] == "nyu"
    assert args.training[0][1].path == "/data/nyu"
    assert args.test == []
    assert args.method.name == "bts"
    assert args.method.batch_size == 4
    assert args.method.loss == "silma"


def test_multiple_datasets_mix(parser_commands):
    parser, commands = parser_commands
    args = parse_args_into_namespaces(
        parser, commands,
        ["nyu", "--path", "/a", "--training",
         "floorplan3d", "--path", "/b", "--type", "diffuse", "--training",
         "--test",
         "synthetic", "--validation",
         "eigen"],
    )
    assert [name for name, _ in args.training] == ["nyu", "floorplan3d"]
    assert [name for name, _ in args.test] == ["floorplan3d"]
    assert [name for name, _ in args.validation] == ["synthetic"]
    assert args.method.name == "eigen"


def test_missing_method_asserts(parser_commands):
    parser, commands = parser_commands
    with pytest.raises(AssertionError):
        parse_args_into_namespaces(
            parser, commands, ["nyu", "--path", "/a", "--training"]
        )


def test_derive_globals(parser_commands):
    parser, commands = parser_commands
    args = parse_args_into_namespaces(
        parser, commands,
        ["stdepth", "--path", "/data/renders", "--validation",
         "--depth-method", "wysiwyg", "laina"],
    )
    derive_globals(args)
    assert args.ds_name == "renders"
    assert args.depth_method == "wysiwyg"


def test_method_defaults_match_reference(parser_commands):
    """Spot-check defaults the reference hardcodes (SURVEY §2.2)."""
    parser, commands = parser_commands
    for argv, checks in [
        (["synthetic", "--validation", "bts"],
         {"learning_rate": 1e-4, "batch_size": 8, "encoder": "densenet161_bts",
          "loss": "silma", "variance_focus": 0.85, "adam_eps": 1e-3,
          "weight_decay": 1e-2, "out_channels": 10}),
        (["synthetic", "--validation", "laina"],
         {"batch_size": 16, "out_channels": 20, "loss": "mae+composite"}),
        (["synthetic", "--validation", "dorn"],
         {"ord_num": 68, "alpha": 0.001, "beta": 1.0, "kernel_size": 16}),
        (["synthetic", "--validation", "midas"],
         {"loss": "ssitrim", "alpha": 0.5, "reduction": "batch-based"}),
        (["synthetic", "--validation", "vnl"],
         {"dec_out_c": 150, "scale_decoder_lr": 0.1, "depth_min": 0.01,
          "depth_max": 1.1, "diff_loss_weight": 6}),
    ]:
        args = parse_args_into_namespaces(parser, commands, argv)
        for k, v in checks.items():
            assert getattr(args.method, k) == v, (argv[-1], k)
    # shared defaults (base_module.py:324-334)
    args = parse_args_into_namespaces(parser, commands, ["synthetic", "--validation", "bts"])
    assert args.method.depth_loss_weight == 10.0
    assert args.method.comp_loss_weight == 2.0
    assert args.method.fbdiv_loss_weight == 0.2
    assert args.method.ssim_loss_weight == 2.0
