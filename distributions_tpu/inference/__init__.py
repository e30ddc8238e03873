"""Inference drivers over the mixture log-prob graph: collapsed Gibbs
(sequential / blocked / annealed), SMC, and gradient-based backends."""
