"""Convergence parity vs the reference computation (torch), CI-sized.

Both frameworks train the same model from the same init on identical
synthetic batches; their loss trajectories must coincide. The committed
full-size run (benchmarks/convergence_parity.json: 40 epochs, max rel
deviation 0.33%, identical final val WER) is the headline evidence; this
test keeps the harness honest at a few-epoch scale. Reference anchor:
/root/reference/examples/librispeech.sh (the reference's de-facto
end-to-end test, network-bound) — this is its offline equivalent.
"""

import sys

import pytest


@pytest.mark.slow
def test_torch_jax_trajectories_match(tmp_path):
    sys.path.insert(0, 'benchmarks')
    from convergence_parity import run
    result = run(epochs=2, n_train=32, n_val=16,
                 root=str(tmp_path / 'corpus'))
    assert result['max_rel_loss_deviation'] < 0.01, result
    assert len(result['jax_loss_per_epoch']) == 2
    # both losses must actually be training (dropping from ~CTC init)
    assert result['jax_loss_per_epoch'][-1] < result['jax_loss_per_epoch'][0]
