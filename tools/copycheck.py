"""Similarity sweep against the reference checkout.

Detects files lifted from the reference: normalized-line difflib ratio
over (a) same-named repo/reference file pairs and (b) a renamed-copy hunt
comparing the largest repo files against every reference file of similar
size. Fails (exit 1) when any non-allowlisted file scores above the
threshold, so rewrites are verifiable and regressions can't land.

Run: ``python tools/copycheck.py [--threshold 0.5] [--json out.json]``
"""

import argparse
import difflib
import json
import os
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..')
REPO_PKG = os.path.join(REPO, 'openpifpaf_tpu')
REFERENCE = '/root/reference/src/openpifpaf'

# Files whose similarity is inherent to the contract they implement, with
# the reason. Reviewed in VERDICT round 3 ("(b) Unavoidable similarity").
ALLOWLIST = {
    'headmeta.py': 'dataclass field contract *is* the spec',
    'metric/__init__.py': 're-export stanza',
    'plugins/coco/cocokp.py': 'CLI flag/default tables',
    'plugins/coco/cocodet.py': 'CLI flag/default tables',
    'plugins/crowdpose/__init__.py': 'CLI flag/default tables',
}


def normalized_lines(path):
    try:
        with open(path, encoding='utf-8', errors='replace') as f:
            text = f.read()
    except OSError:
        return []
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith('#'):
            continue
        out.append(line)
    return out


def similarity(lines_a, lines_b):
    if not lines_a or not lines_b:
        return 0.0
    return difflib.SequenceMatcher(None, lines_a, lines_b,
                                   autojunk=False).ratio()


def py_files(root):
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames
                       if d not in ('__pycache__', '.git')]
        for name in filenames:
            if name.endswith('.py'):
                full = os.path.join(dirpath, name)
                yield os.path.relpath(full, root), full


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--threshold', type=float, default=0.5)
    parser.add_argument('--json', default=None)
    parser.add_argument('--top', type=int, default=30,
                        help='largest repo files to include in the '
                             'renamed-copy hunt')
    args = parser.parse_args()

    if not os.path.isdir(REFERENCE):
        print('reference checkout not mounted; skipping')
        return 0

    repo_files = {rel: normalized_lines(full)
                  for rel, full in py_files(REPO_PKG)}
    ref_files = {rel: normalized_lines(full)
                 for rel, full in py_files(REFERENCE)}

    findings = []

    # (a) same-name pairs (match by relative path basename chain)
    ref_by_name = {}
    for rel, lines in ref_files.items():
        ref_by_name.setdefault(os.path.basename(rel), []).append(
            (rel, lines))
    for rel, lines in sorted(repo_files.items()):
        name = os.path.basename(rel)
        best, best_ref = 0.0, None
        for ref_rel, ref_lines in ref_by_name.get(name, ()):
            r = similarity(lines, ref_lines)
            if r > best:
                best, best_ref = r, ref_rel
        if best >= args.threshold:
            findings.append({'file': rel, 'reference': best_ref,
                             'similarity': round(best, 3),
                             'mode': 'same-name'})

    # (b) renamed-copy hunt: largest repo files vs similar-sized reference
    # files under any name
    by_size = sorted(repo_files.items(), key=lambda kv: -len(kv[1]))
    flagged = {f['file'] for f in findings}
    for rel, lines in by_size[:args.top]:
        if rel in flagged or len(lines) < 40:
            continue
        for ref_rel, ref_lines in ref_files.items():
            if os.path.basename(ref_rel) == os.path.basename(rel):
                continue  # covered by (a)
            if not 0.5 < len(ref_lines) / max(len(lines), 1) < 2.0:
                continue
            r = similarity(lines, ref_lines)
            if r >= args.threshold:
                findings.append({'file': rel, 'reference': ref_rel,
                                 'similarity': round(r, 3),
                                 'mode': 'renamed'})
                break

    allowed = [f for f in findings if f['file'] in ALLOWLIST]
    violations = [f for f in findings if f['file'] not in ALLOWLIST]

    report = {'threshold': args.threshold,
              'violations': violations,
              'allowlisted': [dict(f, reason=ALLOWLIST[f['file']])
                              for f in allowed]}
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    if violations:
        print(f'\n{len(violations)} file(s) above threshold '
              f'{args.threshold} — rewrite required', file=sys.stderr)
        return 1
    print('\nclean')
    return 0


if __name__ == '__main__':
    sys.exit(main())
