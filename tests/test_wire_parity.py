"""Protobuf WIRE parity against the reference's own schema: bytes written
by distributions_tpu.io.protobuf must parse, field for field, under
message classes compiled from /root/reference/distributions/io/schema.proto
(and vice versa).  Field-number compatibility is asserted by execution,
not by eyeballing the .proto files."""

import importlib.util
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

import jax

from distributions_tpu.io import protobuf as iop
from distributions_tpu.models import MODULES
from tests.test_models import load_shared, group_from_values

REF_PROTO = '/root/reference/distributions/io/schema.proto'


@pytest.fixture(scope='module')
def ref_pb2():
    if not os.path.exists(REF_PROTO):
        pytest.skip('reference schema not available')
    td = tempfile.mkdtemp()
    pkg = os.path.join(td, 'refwire')
    os.makedirs(pkg)
    import shutil
    shutil.copy(REF_PROTO, os.path.join(pkg, 'ref_schema.proto'))
    try:
        subprocess.run(
            ['protoc', '--python_out=.', 'refwire/ref_schema.proto'],
            cwd=td, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        pytest.skip('protoc unavailable')
    spec = importlib.util.spec_from_file_location(
        'ref_schema_pb2', os.path.join(pkg, 'ref_schema_pb2.py'))
    mod = importlib.util.module_from_spec(spec)
    sys.modules['ref_schema_pb2'] = mod
    spec.loader.exec_module(mod)
    return mod


REF_MESSAGES = {
    'bb': 'BetaBernoulli', 'bnb': 'BetaNegativeBinomial',
    'dd': 'DirichletDiscrete', 'dpd': 'DirichletProcessDiscrete',
    'gp': 'GammaPoisson', 'nich': 'NormalInverseChiSq',
    'niw': 'NormalInverseWishart',
}


def _fields(msg):
    out = {}
    for fd, value in msg.ListFields():
        out[fd.name] = list(value) if fd.label == fd.LABEL_REPEATED \
            else value
    return out


@pytest.mark.parametrize('name', sorted(REF_MESSAGES))
def test_shared_bytes_parse_under_reference_schema(name, ref_pb2):
    module = MODULES[name]
    example = module.EXAMPLES[0]
    shared = load_shared(module, example, observe=True)

    ours = iop.shared_dump(name, shared)
    theirs = getattr(ref_pb2, REF_MESSAGES[name]).Shared.FromString(
        ours.SerializeToString())
    got = _fields(theirs)
    want = _fields(ours)
    assert set(got) == set(want), (name, got, want)
    for field in want:
        np.testing.assert_allclose(
            np.asarray(got[field], dtype=np.float64),
            np.asarray(want[field], dtype=np.float64), rtol=1e-6,
            err_msg='%s.Shared.%s' % (name, field))

    # and the reverse: reference-schema bytes parse under ours
    back = type(ours).FromString(theirs.SerializeToString())
    assert _fields(back) == want


@pytest.mark.parametrize('name', sorted(REF_MESSAGES))
def test_group_bytes_parse_under_reference_schema(name, ref_pb2):
    module = MODULES[name]
    example = module.EXAMPLES[0]
    shared = load_shared(module, example, observe=True)
    group = group_from_values(module, shared, example['values'])

    ours = iop.group_dump(name, group, shared=shared)
    theirs = getattr(ref_pb2, REF_MESSAGES[name]).Group.FromString(
        ours.SerializeToString())
    got = _fields(theirs)
    want = _fields(ours)
    assert set(got) == set(want), (name, got, want)
    for field in want:
        np.testing.assert_allclose(
            np.asarray(got[field], dtype=np.float64),
            np.asarray(want[field], dtype=np.float64), rtol=1e-6,
            err_msg='%s.Group.%s' % (name, field))
