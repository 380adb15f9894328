"""Multi-process (multi-host) distributed mode: 2 OS processes x 4 virtual
CPU devices joined by jax.distributed into one 8-device global mesh, gloo
collectives standing in for DCN (SURVEY §5's multi-host note)."""

import numpy as np
import pytest

import jax

from rerevst_tpu.parallel import (
    frame_mesh,
    local_device_count_in,
    mesh_process_count,
)


def test_single_process_mesh_helpers():
    mesh = frame_mesh(8)
    assert mesh_process_count(mesh) == 1
    assert local_device_count_in(mesh) == 8


def test_two_process_dryrun_train_and_two_pass():
    """The full multi-process dry run: sharded train step (grads pmean'd
    ACROSS process boundaries), Pass 1 psum/pmin/pmax and Pass 2 decode over
    per-process local input shards — every process must compute the
    identical pmean'd loss (asserted inside)."""
    import __graft_entry__ as g

    g.dryrun_multichip_multiprocess(2, 4)


def test_train_cli_exposes_distributed_flags():
    from rerevst_tpu.train.__main__ import build_parser, config_from_args

    args = build_parser().parse_args(
        ["--data_parallel", "8", "--coordinator", "localhost:1234",
         "--num_processes", "2", "--process_id", "1"])
    assert args.num_processes == 2 and args.process_id == 1
    assert config_from_args(args).data_parallel == 8
