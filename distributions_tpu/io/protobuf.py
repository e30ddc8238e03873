"""Protobuf (de)serialization for model Shareds/Groups and clustering
models, wire-compatible with the reference (reference
include/distributions/io/protobuf.hpp:126-130 traits + per-model
protobuf_load/dump, e.g. dbg/models/gp.py:64-71).

Functions are keyed by the model's short name; messages come from the
protoc-generated schema_pb2 (schema.proto matches the reference's field
numbering)."""

import numpy as np
import jax.numpy as jnp

from distributions_tpu.io import schema_pb2
from distributions_tpu.models import bb, bnb, dd, dpd, gp, nich, niw
from distributions_tpu import clustering as _clustering

MESSAGES = {
    'bb': schema_pb2.BetaBernoulli,
    'bnb': schema_pb2.BetaNegativeBinomial,
    'dd': schema_pb2.DirichletDiscrete,
    'dpd': schema_pb2.DirichletProcessDiscrete,
    'gp': schema_pb2.GammaPoisson,
    'nich': schema_pb2.NormalInverseChiSq,
    'niw': schema_pb2.NormalInverseWishart,
}


# -- Shared -----------------------------------------------------------------

def shared_dump(name, shared, message=None):
    if message is None:
        message = MESSAGES[name].Shared()
    message.Clear()
    if name == 'bb':
        message.alpha = float(shared.alpha)
        message.beta = float(shared.beta)
    elif name == 'bnb':
        message.alpha = float(shared.alpha)
        message.beta = float(shared.beta)
        message.r = int(shared.r)
    elif name == 'dd':
        message.alphas.extend(float(a) for a in shared.alphas)
    elif name == 'dpd':
        message.gamma = float(shared.gamma)
        message.alpha = float(shared.alpha)
        act = np.asarray(dpd.active_mask(shared))
        vals = np.asarray(shared.values)[act]
        message.values.extend(int(v) & 0xFFFFFFFF for v in vals)
        message.betas.extend(
            float(b) for b in np.asarray(shared.betas)[act])
        message.counts.extend(
            int(c) for c in np.asarray(shared.counts)[act])
    elif name == 'gp':
        message.alpha = float(shared.alpha)
        message.inv_beta = float(shared.inv_beta)
    elif name == 'nich':
        message.mu = float(shared.mu)
        message.kappa = float(shared.kappa)
        message.sigmasq = float(shared.sigmasq)
        message.nu = float(shared.nu)
    elif name == 'niw':
        message.mu.extend(float(x) for x in shared.mu)
        message.kappa = float(shared.kappa)
        message.psi.extend(float(x) for x in np.asarray(shared.psi).ravel())
        message.nu = float(shared.nu)
    else:
        raise KeyError(name)
    return message


def shared_load(name, message, cap=None):
    if name == 'bb':
        return bb.Shared(alpha=jnp.float32(message.alpha),
                         beta=jnp.float32(message.beta))
    if name == 'bnb':
        return bnb.Shared(alpha=jnp.float32(message.alpha),
                          beta=jnp.float32(message.beta),
                          r=jnp.int32(message.r))
    if name == 'dd':
        return dd.Shared(alphas=jnp.asarray(list(message.alphas),
                                            jnp.float32))
    if name == 'dpd':
        raw = {
            'gamma': message.gamma, 'alpha': message.alpha,
            'betas': {np.int32(np.uint32(v)).item(): b
                      for v, b in zip(message.values, message.betas)},
            'counts': {np.int32(np.uint32(v)).item(): c
                       for v, c in zip(message.values, message.counts)},
        }
        return dpd.shared_from_dict(raw, cap or dpd.DEFAULT_CAPACITY)
    if name == 'gp':
        return gp.Shared(alpha=jnp.float32(message.alpha),
                         inv_beta=jnp.float32(message.inv_beta))
    if name == 'nich':
        return nich.Shared(mu=jnp.float32(message.mu),
                           kappa=jnp.float32(message.kappa),
                           sigmasq=jnp.float32(message.sigmasq),
                           nu=jnp.float32(message.nu))
    if name == 'niw':
        mu = jnp.asarray(list(message.mu), jnp.float32)
        d = mu.shape[0]
        return niw.Shared(
            mu=mu, kappa=jnp.float32(message.kappa),
            psi=jnp.asarray(list(message.psi),
                            jnp.float32).reshape(d, d),
            nu=jnp.float32(message.nu))
    raise KeyError(name)


# -- Group ------------------------------------------------------------------

def group_dump(name, group, message=None, shared=None):
    if message is None:
        message = MESSAGES[name].Group()
    message.Clear()
    if name == 'bb':
        message.heads = int(group.heads)
        message.tails = int(group.tails)
    elif name == 'bnb':
        message.count = int(group.count)
        message.sum = int(group.sum)
    elif name == 'dd':
        message.counts.extend(int(c) for c in group.counts)
    elif name == 'dpd':
        assert shared is not None, 'dpd group_dump needs shared'
        vals = np.asarray(shared.values)
        counts = np.asarray(group.counts)
        for v, c in zip(vals, counts):
            if c != 0:
                message.keys.append(int(v) & 0xFFFFFFFF)
                message.values.append(int(c))
    elif name == 'gp':
        message.count = int(group.count)
        message.sum = int(group.sum)
        message.log_prod = float(group.log_prod)
    elif name == 'nich':
        message.count = int(group.count)
        message.mean = float(group.mean)
        message.count_times_variance = float(group.count_times_variance)
    elif name == 'niw':
        message.count = int(group.count)
        message.sum_x.extend(float(x) for x in group.sum_x)
        message.sum_xxT.extend(
            float(x) for x in np.asarray(group.sum_xxT).ravel())
    else:
        raise KeyError(name)
    return message


def group_load(name, message, shared=None):
    if name == 'bb':
        return bb.Group(heads=jnp.int32(message.heads),
                        tails=jnp.int32(message.tails))
    if name == 'bnb':
        return bnb.Group(count=jnp.int32(message.count),
                         sum=jnp.int32(message.sum))
    if name == 'dd':
        return dd.Group(counts=jnp.asarray(list(message.counts), jnp.int32))
    if name == 'dpd':
        assert shared is not None, 'dpd group_load needs shared'
        raw = {'counts': {np.int32(np.uint32(k)).item(): v
                          for k, v in zip(message.keys, message.values)}}
        return dpd.group_from_dict(raw, shared)
    if name == 'gp':
        return gp.Group(count=jnp.int32(message.count),
                        sum=jnp.int32(message.sum),
                        log_prod=jnp.float32(message.log_prod))
    if name == 'nich':
        return nich.Group(
            count=jnp.int32(message.count), mean=jnp.float32(message.mean),
            count_times_variance=jnp.float32(message.count_times_variance))
    if name == 'niw':
        sum_x = jnp.asarray(list(message.sum_x), jnp.float32)
        d = sum_x.shape[0]
        return niw.Group(
            count=jnp.int32(message.count), sum_x=sum_x,
            sum_xxT=jnp.asarray(list(message.sum_xxT),
                                jnp.float32).reshape(d, d))
    raise KeyError(name)


# -- Clustering -------------------------------------------------------------

def clustering_dump(model, message=None):
    if message is None:
        message = schema_pb2.Clustering()
    message.Clear()
    if isinstance(model, _clustering.PitmanYor):
        message.pitman_yor.alpha = float(model.alpha)
        message.pitman_yor.d = float(model.d)
    else:
        message.low_entropy.dataset_size = int(model.dataset_size)
    return message


def clustering_load(message):
    if message.HasField('pitman_yor'):
        return _clustering.PitmanYor(
            alpha=jnp.float32(message.pitman_yor.alpha),
            d=jnp.float32(message.pitman_yor.d))
    return _clustering.LowEntropy(
        dataset_size=jnp.int32(message.low_entropy.dataset_size))
