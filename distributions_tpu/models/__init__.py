"""Conjugate component models, one module per reference model
(reference distributions/{dbg,hp,lp}/models/)."""

from distributions_tpu.models import bb, bnb, dd, dpd, gp, nich, niw

# Registry keyed by the reference's short names (reference tests/util.py
# discovers flavor/name pairs by globbing; here the registry is explicit).
MODULES = {
    'bb': bb,
    'bnb': bnb,
    'dd': dd,
    'dpd': dpd,
    'gp': gp,
    'nich': nich,
    'niw': niw,
}

__all__ = ['bb', 'bnb', 'dd', 'dpd', 'gp', 'nich', 'niw', 'MODULES']
