"""Self-time analysis of a jax.profiler trace (trace.json.gz).

Usage: python scripts/analyze_trace.py /tmp/nfi_trace [n_steps] [--tree]

Computes per-op SELF time (duration minus nested children on the same
track) so nested regions (lax.cond bodies, fusions inside conditionals)
aren't double counted, divides by n_steps, and prints the top ops.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def main():
    outdir = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 and \
        not sys.argv[2].startswith('--') else 3
    files = glob.glob(os.path.join(outdir, '**', '*.trace.json.gz'),
                      recursive=True)
    newest = max(files, key=os.path.getmtime)
    with gzip.open(newest, 'rt') as f:
        data = json.load(f)

    pid_names = {}
    tid_names = {}
    for e in data.get('traceEvents', []):
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_names[e['pid']] = e['args'].get('name', '')
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            tid_names[(e['pid'], e['tid'])] = e['args'].get('name', '')

    events = [e for e in data.get('traceEvents', [])
              if e.get('ph') == 'X' and 'dur' in e and 'ts' in e]
    by_track = defaultdict(list)
    for e in events:
        by_track[(e['pid'], e.get('tid'))].append(e)

    self_us = defaultdict(float)
    total_us = defaultdict(float)
    track_total = defaultdict(float)
    for track, evs in by_track.items():
        tname = f'{pid_names.get(track[0], track[0])}/' \
                f'{tid_names.get(track, track[1])}'
        # Only TPU op tracks (skip host python/runtime threads).
        if 'TPU' not in tname and 'XLA' not in tname and \
                'device' not in tname.lower():
            continue
        evs.sort(key=lambda e: (e['ts'], -e['dur']))
        stack = []
        for e in evs:
            while stack and stack[-1]['ts'] + stack[-1]['dur'] <= e['ts']:
                stack.pop()
            self_us[e['name']] += e['dur']
            total_us[e['name']] += e['dur']
            if stack:
                self_us[stack[-1]['name']] -= e['dur']
            stack.append(e)
            track_total[tname] += e['dur']
            # parent subtraction handles one level; nested deeper is fine
            # because each event subtracts from its immediate parent.

    for t, us in sorted(track_total.items(), key=lambda kv: -kv[1]):
        print(f'track {t}: {us / n_steps / 1e3:.1f} ms/step')
    print()
    print(f'{"self ms/step":>14}  {"total":>8}  name')
    top = sorted(self_us.items(), key=lambda kv: -kv[1])[:50]
    for name, us in top:
        print(f'{us / n_steps / 1e3:14.2f}  '
              f'{total_us[name] / n_steps / 1e3:8.2f}  {name[:120]}')


if __name__ == '__main__':
    main()
