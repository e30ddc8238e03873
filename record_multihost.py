"""Record the multi-process equality check as a per-round JSON artifact.

Runs `__graft_entry__.dryrun_multihost` (REAL jax.distributed + gloo
2-process group, bitwise-compared against a single-process run of the
same global mesh) and writes MULTIHOST_r{N}.json with the outcome, so
multi-host reproducibility is machine-visible per round the same way
MULTICHIP_r{N}.json records the virtual-mesh dryrun.

Usage: python record_multihost.py [--round N] [--out FILE]
"""

import argparse
import json
import os
import re
import time
import traceback


def current_round(repo):
    rounds = [0]
    for name in os.listdir(repo):
        m = re.match(r'(?:VERDICT|BENCH_r)(\d+)', name)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def main():
    repo = os.path.dirname(os.path.abspath(__file__))
    ap = argparse.ArgumentParser()
    ap.add_argument('--round', type=int, default=None)
    ap.add_argument('--out', default=None)
    ap.add_argument('--nproc', type=int, default=2)
    ap.add_argument('--devices-per-process', type=int, default=4)
    args = ap.parse_args()

    rnd = args.round if args.round is not None else current_round(repo)
    out = args.out or os.path.join(repo, 'MULTIHOST_r%02d.json' % rnd)

    import __graft_entry__ as ge
    t0 = time.time()
    result = {
        'nproc': args.nproc,
        'devices_per_process': args.devices_per_process,
        'check': 'dryrun_multihost: 2-proc gloo group sweep assignments/'
                 'counts bitwise-equal to single-process same-size mesh; '
                 'plus runner/2d-mesh/orbax worker modes',
    }
    try:
        ge.dryrun_multihost(args.nproc, args.devices_per_process)
        result['ok'] = True
        result['tail'] = ''
    except BaseException as e:          # record the failure, don't crash
        result['ok'] = False
        result['tail'] = (traceback.format_exc()[-2000:]
                          if not isinstance(e, AssertionError)
                          else str(e)[-2000:])

    # the other multi-process surfaces, each a REAL 2-process gloo group
    # (production runner w/ checkpoint, 2-D rows-x-components mesh, orbax
    # per-host-parallel checkpoint round trip)
    import subprocess
    import sys as _sys
    here = os.path.dirname(os.path.abspath(__file__))
    for mode in ('runner', '2d', 'orbax'):
        t1 = time.time()
        cmd = [_sys.executable, '-m', 'pytest', '-x', '-q',
               'tests/test_multiprocess.py', '-k', {
                   'runner': 'runner_with_checkpoint',
                   '2d': '2d_mesh',
                   'orbax': 'orbax_roundtrip'}[mode]]
        env = dict(os.environ)
        env['JAX_PLATFORMS'] = 'cpu'
        # one retry: sequential gloo groups occasionally poison the next
        # group's socket setup (worker 0 stalls ~300 s into the
        # coordination-service timeout, then the shutdown barrier fails;
        # the identical test passes standalone and on retry — an infra
        # race in gloo port reuse, not a product path).  Retries are
        # recorded so the artifact stays honest.
        attempts = 0
        while True:
            attempts += 1
            p = subprocess.run(cmd, cwd=here, env=env,
                               capture_output=True, timeout=600)
            if p.returncode == 0 or attempts >= 2:
                break
            time.sleep(5)
        result['mode_%s' % mode] = {
            'ok': p.returncode == 0,
            'attempts': attempts,
            'elapsed_s': round(time.time() - t1, 1),
            'tail': ('' if p.returncode == 0
                     else p.stdout.decode(errors='replace')[-4000:]),
        }
        result['ok'] = result['ok'] and p.returncode == 0
    result['elapsed_s'] = round(time.time() - t0, 1)
    with open(out, 'w') as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result)[:400])
    print('wrote', out)
    return 0 if result['ok'] else 1


if __name__ == '__main__':
    raise SystemExit(main())
