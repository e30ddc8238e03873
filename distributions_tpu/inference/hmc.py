"""Hamiltonian Monte Carlo + NUTS over an arbitrary log-prob pytree graph.

Generic: `logprob_fn: params -> scalar`, params any pytree.  Used with
inference.logprob.make_mixture_logprob these sample the uncollapsed mixture
posterior on-device.

- `hmc`: fixed-length leapfrog with dual-averaging step-size adaptation
  (Hoffman & Gelman 2014, Alg. 5 schedule) and diagonal mass adaptation
  from warmup variance.
- `nuts`: iterative multinomial no-U-turn sampler with a static maximum
  tree depth (fully `lax`-compatible: the doubling loop is a fori over
  max_depth; each subtree is built by a scan over its leapfrog steps).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

map_ = jax.tree_util.tree_map


def _flat(params):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [l.shape for l in leaves]
    sizes = [int(l.size) for l in leaves]
    flat = jnp.concatenate([jnp.ravel(l) for l in leaves]) if leaves else (
        jnp.zeros(0))

    def unflat(x):
        out = []
        i = 0
        for s, n in zip(shapes, sizes):
            out.append(x[i:i + n].reshape(s))
            i += n
        return jax.tree_util.tree_unflatten(treedef, out)

    return flat, unflat


def _leapfrog(grad_fn, q, p, eps, inv_mass, n_steps):
    def body(_, qp):
        q, p = qp
        p = p + 0.5 * eps * grad_fn(q)
        q = q + eps * inv_mass * p
        p = p + 0.5 * eps * grad_fn(q)
        return (q, p)
    return lax.fori_loop(0, n_steps, body, (q, p))


def hmc(key, logprob_fn, init_params, num_samples=1000, num_warmup=500,
        num_leapfrog=32, target_accept=0.8, init_step_size=0.1,
        jitter_steps=True):
    """Run adaptive HMC; returns (samples pytree with leading [num_samples],
    info dict)."""
    q0, unflat = _flat(init_params)
    dim = q0.shape[0]

    def logp_flat(q):
        return logprob_fn(unflat(q))

    grad_fn = jax.grad(logp_flat)

    # dual averaging state: (log_eps, log_eps_bar, h_bar)
    mu = jnp.log(10.0 * init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def kinetic(p, inv_mass):
        return 0.5 * jnp.sum(p * p * inv_mass)

    def step(carry, inp):
        q, log_eps, log_eps_bar, h_bar, inv_mass, welford = carry
        i, step_key = inp
        k1, k2, k3 = jax.random.split(step_key, 3)
        eps = jnp.exp(log_eps)
        p = jax.random.normal(k1, (dim,)) / jnp.sqrt(inv_mass)
        n_steps = jnp.where(
            jitter_steps,
            jax.random.randint(k3, (), num_leapfrog // 2,
                               num_leapfrog + 1),
            num_leapfrog)
        q_new, p_new = _leapfrog(grad_fn, q, p, eps, inv_mass, n_steps)
        h0 = -logp_flat(q) + kinetic(p, inv_mass)
        h1 = -logp_flat(q_new) + kinetic(p_new, inv_mass)
        log_accept = jnp.minimum(0.0, h0 - h1)
        log_accept = jnp.where(jnp.isnan(log_accept), -jnp.inf, log_accept)
        accept = jnp.log(jax.random.uniform(k2)) < log_accept
        q = jnp.where(accept, q_new, q)

        # dual averaging (only during warmup)
        in_warmup = i < num_warmup
        m = jnp.maximum(i + 1 - 0, 1).astype(jnp.float32)
        h_bar_new = ((1.0 - 1.0 / (m + t0)) * h_bar
                     + (target_accept - jnp.exp(log_accept)) / (m + t0))
        log_eps_new = mu - jnp.sqrt(m) / gamma * h_bar_new
        eta = m ** (-kappa)
        log_eps_bar_new = eta * log_eps_new + (1 - eta) * log_eps_bar
        log_eps = jnp.where(in_warmup, log_eps_new, log_eps_bar)
        log_eps_bar = jnp.where(in_warmup, log_eps_bar_new, log_eps_bar)
        h_bar = jnp.where(in_warmup, h_bar_new, h_bar)

        # Welford variance accumulation over the 2nd half of warmup
        w_n, w_mean, w_m2 = welford
        in_window = in_warmup & (i >= num_warmup // 2)
        w_n1 = w_n + jnp.where(in_window, 1.0, 0.0)
        delta = q - w_mean
        w_mean = jnp.where(in_window, w_mean + delta / jnp.maximum(w_n1, 1),
                           w_mean)
        w_m2 = jnp.where(in_window, w_m2 + delta * (q - w_mean), w_m2)
        # switch to adapted diagonal mass at the end of warmup
        var = w_m2 / jnp.maximum(w_n1 - 1, 1)
        inv_mass = jnp.where(
            (i == num_warmup - 1) & (w_n1 > 10), var, inv_mass)

        carry = (q, log_eps, log_eps_bar, h_bar, inv_mass,
                 (w_n1, w_mean, w_m2))
        return carry, (q, jnp.exp(log_accept))

    keys = jax.random.split(key, num_warmup + num_samples)
    welford0 = (jnp.float32(0), jnp.zeros(dim), jnp.zeros(dim))
    carry0 = (q0, jnp.log(init_step_size), jnp.log(init_step_size),
              jnp.float32(0), jnp.ones(dim), welford0)
    carry, (qs, accepts) = lax.scan(
        step, carry0,
        (jnp.arange(num_warmup + num_samples), keys))
    samples = jax.vmap(unflat)(qs[num_warmup:])
    info = {'accept_rate': jnp.mean(accepts[num_warmup:]),
            'step_size': jnp.exp(carry[1])}
    return samples, info


def nuts(key, logprob_fn, init_params, num_samples=1000, num_warmup=500,
         max_depth=8, target_accept=0.8, init_step_size=0.1):
    """Iterative multinomial NUTS with static max tree depth.

    Implementation note: to stay `lax.scan`-compatible the doubling loop
    runs exactly `max_depth` times with a `valid` flag that turns off once
    a U-turn or divergence occurs — equivalent to early termination."""
    q0, unflat = _flat(init_params)
    dim = q0.shape[0]

    def logp_flat(q):
        return logprob_fn(unflat(q))

    value_and_grad = jax.value_and_grad(logp_flat)

    mu = jnp.log(10.0 * init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def leaf(q, p, eps, direction, inv_mass):
        """One leapfrog step in the given direction."""
        e = eps * direction
        _, g = value_and_grad(q)
        p = p + 0.5 * e * g
        q = q + e * inv_mass * p
        v, g = value_and_grad(q)
        p = p + 0.5 * e * g
        h = -v + 0.5 * jnp.sum(p * p * inv_mass)
        return q, p, h

    def step(carry, inp):
        q, log_eps, log_eps_bar, h_bar, inv_mass = carry
        i, step_key = inp
        k1, k2, k3 = jax.random.split(step_key, 3)
        eps = jnp.exp(log_eps)
        p0 = jax.random.normal(k1, (dim,)) / jnp.sqrt(inv_mass)
        v0 = logp_flat(q)
        h0 = -v0 + 0.5 * jnp.sum(p0 * p0 * inv_mass)

        # trajectory state
        init = dict(
            q_minus=q, p_minus=p0, q_plus=q, p_plus=p0,
            q_prop=q, log_sum_w=jnp.float32(0.0),  # log w of start = -dh =0
            valid=jnp.bool_(True), depth=0,
            sum_p=p0, alpha_sum=jnp.float32(0.0), n_alpha=jnp.float32(0.0))

        def doubling(d, state, dkey):
            """One doubling: extend 2^d steps in a random direction,
            multinomial-sample a proposal from the new subtree.

            Sub-U-turn checking uses the iterative checkpoint scheme: the
            start state of every currently-open dyadic block lives at
            checkpoint slot popcount(leaf); a block of size 2^j completing
            at leaf n has its start at slot popcount(n) - j, so leaf n
            checks the contiguous slots [popcount(n)-t, popcount(n)-1]
            where t = trailing-ones(n)."""
            dir_key, sel_key, step_keys = jax.random.split(dkey, 3)
            direction = jnp.where(jax.random.bernoulli(dir_key), 1.0, -1.0)
            n_steps = 2 ** d

            # static per-leaf dyadic bookkeeping
            import numpy as _np
            leaf_ids = _np.arange(n_steps)
            popcounts = jnp.asarray(
                [int(bin(i).count('1')) for i in leaf_ids])
            trailing_ones = jnp.asarray(
                [len(bin(i)[2:]) - len(bin(i)[2:].rstrip('1'))
                 for i in leaf_ids])
            is_even = jnp.asarray(leaf_ids % 2 == 0)
            n_ckpt = max(d, 1)

            def ext_body(carry, inp):
                (qe, pe, log_sum_w_sub, q_sub, sum_p_sub, ok, a_sum, n_a,
                 sel_key, q_ckpt, p_ckpt) = carry
                n_leaf, pc, t_ones, even = inp
                qe, pe, h = leaf(qe, pe, eps, direction, inv_mass)
                log_w = h0 - h
                diverged = jnp.isnan(log_w) | (log_w < -1000.0)

                # store checkpoint at even leaves (open-block starts)
                slot = jnp.clip(pc, 0, n_ckpt - 1)
                q_ckpt = jnp.where(even, q_ckpt.at[slot].set(qe), q_ckpt)
                p_ckpt = jnp.where(even, p_ckpt.at[slot].set(pe), p_ckpt)

                # check completed sub-blocks: slots [pc - t_ones, pc - 1]
                def check(j, turning):
                    in_range = (j >= pc - t_ones) & (j <= pc - 1)
                    dq = direction * (qe - q_ckpt[j])
                    turn_j = ((jnp.dot(dq, p_ckpt[j] * inv_mass) < 0)
                              | (jnp.dot(dq, pe * inv_mass) < 0))
                    return turning | (in_range & turn_j)

                sub_turn = lax.fori_loop(0, n_ckpt, check, jnp.bool_(False))

                ok = ok & ~diverged & ~sub_turn
                log_w = jnp.where(ok, log_w, -jnp.inf)
                # multinomial online selection within the subtree
                new_total = jnp.logaddexp(log_sum_w_sub, log_w)
                sel_key, use_key = jax.random.split(sel_key)
                take = (jnp.log(jax.random.uniform(use_key))
                        < log_w - new_total)
                q_sub = jnp.where(take, qe, q_sub)
                alpha = jnp.exp(jnp.minimum(0.0, h0 - h))
                a_sum = a_sum + jnp.where(jnp.isnan(alpha), 0.0, alpha)
                n_a = n_a + 1.0
                return (qe, pe, new_total, q_sub, sum_p_sub + pe, ok,
                        a_sum, n_a, sel_key, q_ckpt, p_ckpt), None

            q_edge = jnp.where(direction > 0, state['q_plus'],
                               state['q_minus'])
            p_edge = jnp.where(direction > 0, state['p_plus'],
                               state['p_minus'])
            ckpt0 = jnp.zeros((n_ckpt, dim))
            sub0 = (q_edge, p_edge, -jnp.inf, q_edge, jnp.zeros(dim),
                    state['valid'], state['alpha_sum'], state['n_alpha'],
                    step_keys, ckpt0, ckpt0)
            (qe, pe, log_sum_w_sub, q_sub, sum_p_sub, ok, a_sum, n_a,
             _, _, _), _ = lax.scan(
                ext_body, sub0,
                (jnp.asarray(leaf_ids), popcounts, trailing_ones, is_even),
                unroll=False)

            # update edges
            q_plus = jnp.where(direction > 0, qe, state['q_plus'])
            p_plus = jnp.where(direction > 0, pe, state['p_plus'])
            q_minus = jnp.where(direction > 0, state['q_minus'], qe)
            p_minus = jnp.where(direction > 0, state['p_minus'], pe)

            # multinomial accept of subtree proposal vs current
            total = jnp.logaddexp(state['log_sum_w'], log_sum_w_sub)
            take = (jnp.log(jax.random.uniform(sel_key))
                    < log_sum_w_sub - total)
            q_prop = jnp.where(ok & take, q_sub, state['q_prop'])

            # U-turn check across the full trajectory
            dq = q_plus - q_minus
            noturn = ((jnp.dot(dq, p_minus * inv_mass) >= 0)
                      & (jnp.dot(dq, p_plus * inv_mass) >= 0))
            valid = ok & noturn

            return dict(
                q_minus=q_minus, p_minus=p_minus, q_plus=q_plus,
                p_plus=p_plus, q_prop=q_prop,
                log_sum_w=jnp.where(ok, total, state['log_sum_w']),
                valid=valid, depth=d + 1,
                sum_p=state['sum_p'] + sum_p_sub,
                alpha_sum=a_sum, n_alpha=n_a)

        dkeys = jax.random.split(k2, max_depth)

        # python-unrolled doubling loop: each subtree size 2^d is static
        state = init
        for d in range(max_depth):
            new_state = doubling(d, state, dkeys[d])
            # freeze once invalid (equivalent to early termination)
            state = map_(
                lambda new, old: jnp.where(state['valid'], new, old),
                new_state, state)
        q = state['q_prop']

        accept_stat = state['alpha_sum'] / jnp.maximum(state['n_alpha'], 1)
        accept_stat = jnp.where(jnp.isnan(accept_stat), 0.0, accept_stat)
        in_warmup = i < num_warmup
        m = jnp.maximum(i + 1, 1).astype(jnp.float32)
        h_bar_new = ((1.0 - 1.0 / (m + t0)) * h_bar
                     + (target_accept - accept_stat) / (m + t0))
        log_eps_new = jnp.clip(mu - jnp.sqrt(m) / gamma * h_bar_new,
                               -12.0, 4.0)
        eta = m ** (-kappa)
        log_eps_bar_new = eta * log_eps_new + (1 - eta) * log_eps_bar
        log_eps = jnp.where(in_warmup, log_eps_new, log_eps_bar)
        log_eps_bar = jnp.where(in_warmup, log_eps_bar_new, log_eps_bar)
        h_bar = jnp.where(in_warmup, h_bar_new, h_bar)

        return ((q, log_eps, log_eps_bar, h_bar, inv_mass),
                (q, accept_stat))

    keys = jax.random.split(key, num_warmup + num_samples)
    carry0 = (q0, jnp.log(init_step_size), jnp.log(init_step_size),
              jnp.float32(0), jnp.ones(dim))
    carry, (qs, accepts) = lax.scan(
        step, carry0, (jnp.arange(num_warmup + num_samples), keys))
    samples = jax.vmap(unflat)(qs[num_warmup:])
    info = {'accept_rate': jnp.mean(accepts[num_warmup:]),
            'step_size': jnp.exp(carry[1])}
    return samples, info
