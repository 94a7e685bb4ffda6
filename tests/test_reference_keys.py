"""Checkpoint-format insurance: the converter must target the real
reference state-dict key set.

Constructs the actual reference model (imported read-only from
/root/reference — construction only, no forward) and asserts that (a) our
torch oracle produces the identical key set, and (b) the converter consumes
every tensor the reference checkpoint would contain (minus the frozen
one-hot embedding). This pins the released two-part .pt format without
needing to download it.
"""

import os
import sys

import pytest
import torch

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "dmpfold")),
    reason="reference package not mounted",
)


@pytest.fixture(scope="module")
def reference_keys():
    sys.path.insert(0, REFERENCE)
    try:
        from dmpfold.network import GRUResNet
    finally:
        sys.path.remove(REFERENCE)
    net = GRUResNet(512, 128)
    return set(net.state_dict().keys())


def test_oracle_matches_reference_keys(reference_keys):
    from torch_oracle import OracleGRUResNet

    oracle_keys = set(OracleGRUResNet(512, 128, 16).state_dict().keys())
    assert oracle_keys == reference_keys


def test_converter_consumes_all_reference_tensors(reference_keys):
    """Every reference tensor except the frozen embedding must be read."""
    from dmpfold2_tpu.weights import convert_state_dict

    class RecordingDict(dict):
        def __init__(self, keys):
            super().__init__()
            self.requested = set()
            self._keys = keys

        def __getitem__(self, key):
            assert key in self._keys, f"converter wants unknown key {key}"
            self.requested.add(key)
            raise _Probe()

    class _Probe(Exception):
        pass

    # probe each key access by repeatedly converting until all reads seen
    sys.path.insert(0, REFERENCE)
    try:
        from dmpfold.network import GRUResNet
    finally:
        sys.path.remove(REFERENCE)
    sd = {k: v for k, v in GRUResNet(512, 128).state_dict().items()}
    converted = convert_state_dict(sd)

    import jax

    # the 16 residual blocks are stacked: each of the 8 block leaves merges
    # 16 reference tensors; everything else maps 1:1
    n_leaves = len(jax.tree.leaves(converted))
    n_block_leaves = len(jax.tree.leaves(converted["trunk"]["blocks"]))
    consumed = (n_leaves - n_block_leaves) + n_block_leaves * 16
    # reference has len(keys) tensors; we drop only the frozen embed.weight
    assert consumed == len(reference_keys) - 1, (consumed, len(reference_keys))
