"""Numeric parity against the ACTUAL reference implementation.

tests/golden/dbg_golden.json is produced by running the reference's own
pure-python dbg flavor (tests/golden/gen_dbg_golden.py executes
/root/reference/distributions/dbg under py3); tests/golden/cpp_golden.json
by compiling and running the reference C++ PitmanYor/LowEntropy
(tests/golden/gen_cpp_golden.cc).  These fixtures are the independent
oracle the reference's flavor-agreement tests provided
(reference tests/test_model_flavors.py:40-136): a transcription slip in any
formula here fails even though every internal-consistency test would pass.

Tolerances: dbg golden is exact float64 math -> 1e-4; C++ golden uses the
reference's fast_log/fast_lgamma tables (~1e-5 relative per call, summed
over up to ~1e3-count partitions) -> 1e-3 relative + small absolute slack.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from distributions_tpu import clustering
from distributions_tpu.models import MODULES

HERE = os.path.dirname(os.path.abspath(__file__))

with open(os.path.join(HERE, 'golden', 'dbg_golden.json')) as f:
    DBG = json.load(f)
with open(os.path.join(HERE, 'golden', 'cpp_golden.json')) as f:
    CPP = json.load(f)

MODEL_NAMES = sorted(DBG['models'].keys())


def _load_shared(name, raw):
    module = MODULES[name]
    if name == 'dpd':
        raw = dict(raw)
        raw['betas'] = {int(k): v for k, v in raw['betas'].items()}
        raw['counts'] = {int(k): v for k, v in raw.get('counts', {}).items()}
        return module.shared_from_dict(raw, cap=64)
    return module.shared_from_dict(raw)


def _convert_value(name, v):
    if name == 'bb':
        return bool(v)
    if name == 'nich':
        return jnp.float32(v)
    if name == 'niw':
        return jnp.asarray(v, jnp.float32)
    return jnp.int32(v)


@pytest.mark.parametrize('name', MODEL_NAMES)
def test_model_scores_match_reference_dbg(name):
    module = MODULES[name]
    for rec in DBG['models'][name]:
        shared = _load_shared(name, rec['shared'])
        values = [_convert_value(name, v) for v in rec['values']]

        group = module.group_init(shared)
        incremental = []
        for v in values:
            incremental.append(float(module.score_value(shared, group, v)))
            group = module.add_value(shared, group, v)

        got_scores = [float(module.score_value(shared, group, v))
                      for v in values]
        got_data = float(module.score_data(shared, group))

        np.testing.assert_allclose(
            got_scores, rec['score_values'], rtol=1e-4, atol=1e-4,
            err_msg='%s example %d score_value' % (name, rec['example']))
        np.testing.assert_allclose(
            got_data, rec['score_data'], rtol=1e-4, atol=1e-4,
            err_msg='%s example %d score_data' % (name, rec['example']))
        np.testing.assert_allclose(
            incremental, rec['incremental_score_values'],
            rtol=1e-4, atol=1e-4,
            err_msg='%s example %d incremental (empty-group start)'
                    % (name, rec['example']))

        for v in values[len(values) // 2:]:
            group = module.remove_value(shared, group, v)
        np.testing.assert_allclose(
            float(module.score_data(shared, group)),
            rec['score_data_after_removes'], rtol=1e-4, atol=1e-4,
            err_msg='%s example %d score_data after removes'
                    % (name, rec['example']))


def test_pitman_yor_score_counts_matches_reference_cpp():
    for rec in CPP['score_counts']:
        model = clustering.PitmanYor.from_dict(
            {'alpha': rec['alpha'], 'd': rec['d']})
        got = float(clustering.py_score_counts(
            model, jnp.asarray(rec['counts'], jnp.int32)))
        np.testing.assert_allclose(
            got, rec['score'], rtol=1e-3, atol=0.02,
            err_msg='PY score_counts %r' % (rec,))


def test_pitman_yor_score_add_remove_matches_reference_cpp():
    for rec in CPP['score_add_remove']:
        model = clustering.PitmanYor.from_dict(
            {'alpha': rec['alpha'], 'd': rec['d']})
        got_add = float(clustering.py_score_add_value(
            model, rec['group_size'], rec['nonempty'], rec['sample_size']))
        np.testing.assert_allclose(
            got_add, rec['add'], rtol=1e-3, atol=2e-3,
            err_msg='PY score_add_value %r' % (rec,))
        if rec['group_size'] > 0:
            got_rem = float(clustering.py_score_remove_value(
                model, rec['group_size'], rec['nonempty'],
                rec['sample_size']))
            np.testing.assert_allclose(
                got_rem, rec['remove'], rtol=1e-3, atol=2e-3,
                err_msg='PY score_remove_value %r' % (rec,))


def test_low_entropy_matches_reference_dbg():
    for rec in DBG['low_entropy']:
        model = clustering.LowEntropy.from_dict(
            {'dataset_size': rec['dataset_size']})
        for row in rec['score_counts']:
            got = float(clustering.le_score_counts(
                model, jnp.asarray(row['counts'], jnp.int32)))
            np.testing.assert_allclose(
                got, row['score'], rtol=1e-4, atol=1e-4,
                err_msg='LE score_counts N=%d %r'
                        % (rec['dataset_size'], row))
        for row in rec['score_add']:
            got_add = float(clustering.le_score_add_value(
                model, row['group_size'], 3, row['sample_size']))
            np.testing.assert_allclose(
                got_add, row['add'], rtol=1e-4, atol=1e-4,
                err_msg='LE score_add_value N=%d %r'
                        % (rec['dataset_size'], row))
            got_rem = float(clustering.le_score_remove_value(
                model, row['group_size'] + 1, 3, row['sample_size'] + 1))
            np.testing.assert_allclose(
                got_rem, row['remove'], rtol=1e-4, atol=1e-4,
                err_msg='LE score_remove_value N=%d %r'
                        % (rec['dataset_size'], row))


def test_low_entropy_matches_reference_cpp():
    """Second oracle: the C++ lp flavor (fast_log tables -> looser tol)."""
    for rec in CPP['le_score_counts']:
        model = clustering.LowEntropy.from_dict(
            {'dataset_size': rec['dataset_size']})
        got = float(clustering.le_score_counts(
            model, jnp.asarray(rec['counts'], jnp.int32)))
        np.testing.assert_allclose(
            got, rec['score'], rtol=1e-3, atol=0.02,
            err_msg='LE/cpp score_counts %r' % (rec,))
