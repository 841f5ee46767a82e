"""Measure the PyTorch-CPU reference baseline in this environment.

BASELINE.json's north star is ">=10x single-image throughput vs PyTorch-CPU
at 641px"; this script produces that denominator as a *measured* number
instead of a hardcoded constant. It builds the reference-layout
shufflenetv2k16 + CompositeField4 shell in torch (tests/torch_ref.py, a
clean-room reimplementation of reference network/basenetworks.py +
heads.py), applies the reference's eval-mode in-graph head postprocessing
(sigmoid / index-add / softplus, reference heads.py:360-378), compiles the
reference's own C++ decoder from /root/reference/src/openpifpaf/csrc, and
times NN forward + CifCaf decode at 641 long edge on CPU — the same
pipeline stages bench.py times on the TPU, on the same synthetic 6-person
fields.

CPU timing is plain wall clock (torch CPU ops block), median of repeats.
Result is cached in BASELINE_TORCH_CPU.json; delete the file to re-measure.
"""

import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, 'BASELINE_TORCH_CPU.json')
CSRC = '/root/reference/src/openpifpaf/csrc'
BUILD_DIR = '/tmp/ref_decoder_build'  # shared with tests/test_reference_parity


def _load_reference_decoder():
    import torch
    import torch.utils.cpp_extension as ce

    os.makedirs(BUILD_DIR, exist_ok=True)
    ce.load(
        name='openpifpaf_ref_decoder',
        sources=sorted(glob.glob(os.path.join(CSRC, 'src', '*.cpp'))),
        extra_include_paths=[os.path.join(CSRC, 'include')],
        extra_cflags=['-std=c++17', '-O2'],
        build_directory=BUILD_DIR,
        is_python_module=False,
        verbose=False)
    return torch


def _cf4_inference(x, n_confidences=1, n_vectors=1):
    """Reference CompositeField4 eval-mode postproc (heads.py:360-378):
    sigmoid on confidences, index-field add on regressions, softplus on
    scales. x: raw head output (B, F, C, H, W)."""
    import torch

    h, w = x.shape[-2:]
    yv, xv = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                            torch.arange(w, dtype=torch.float32),
                            indexing='ij')
    index_field = torch.stack([xv, yv])
    parts = [x[:, :, 0:1]]  # logb passthrough
    parts.append(torch.sigmoid(x[:, :, 1:1 + n_confidences]))
    first = 1 + n_confidences
    for i in range(n_vectors):
        parts.append(x[:, :, first + i * 2:first + (i + 1) * 2] + index_field)
    first += n_vectors * 2
    parts.append(torch.nn.functional.softplus(x[:, :, first:]))
    return torch.cat(parts, dim=2)


def measure(repeats=9):
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    import torch_ref

    torch = _load_reference_decoder()
    torch.manual_seed(0)

    shell = torch_ref.build_shell('shufflenetv2k16')
    shell.eval()

    h, w = 481, 641  # 641 long edge padded to multiple-of-16 + 1
    image = torch.from_numpy(
        np.random.RandomState(0).randn(1, 3, h, w).astype(np.float32))

    def forward():
        with torch.no_grad():
            cif_raw, caf_raw = shell(image)
            cif = _cf4_inference(cif_raw, n_vectors=1)
            caf = _cf4_inference(caf_raw, n_vectors=2)
        return cif, caf

    forward()  # warm (allocator, threadpool spin-up)
    nn_times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        forward()
        nn_times.append(time.perf_counter() - t0)
    nn_s = float(np.median(nn_times))

    # decode: the reference's own sequential C++ CifCaf on the same
    # synthetic 6-person 641px fields bench.py feeds this repo's decoder
    import bench
    import openpifpaf_tpu
    stride = 16
    fh, fw = (h - 1) // stride + 1, (w - 1) // stride + 1
    cif_syn, caf_syn = bench.synthetic_fields(fh, fw, stride)
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    skeleton = np.asarray(datamodule.head_metas[1].skeleton, dtype=np.int64)
    ref = torch.classes.openpifpaf_decoder.CifCaf(
        17, torch.from_numpy(skeleton) - 1)
    cif_t = torch.from_numpy(cif_syn)
    caf_t = torch.from_numpy(caf_syn)
    anns, _ = ref.call(cif_t, stride, caf_t, stride)  # warm
    n_poses = int(anns.shape[0])
    dec_times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        ref.call(cif_t, stride, caf_t, stride)
        dec_times.append(time.perf_counter() - t0)
    dec_s = float(np.median(dec_times))

    result = {
        'nn_ms': round(nn_s * 1e3, 2),
        'decode_ms': round(dec_s * 1e3, 2),
        'img_per_sec': round(1.0 / (nn_s + dec_s), 3),
        'decoded_poses': n_poses,
        'torch_threads': torch.get_num_threads(),
        'host_cpus': os.cpu_count(),
        'torch_version': torch.__version__,
        'note': 'reference-layout shufflenetv2k16 fwd + reference C++ '
                'CifCaf decode, CPU, 641x481, synthetic 6-person fields '
                '(same fields as bench.py decode timing)',
    }
    return result


def cached_measure():
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)
    result = measure()
    with open(CACHE, 'w') as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == '__main__':
    if '--force' in sys.argv and os.path.exists(CACHE):
        os.remove(CACHE)
    print(json.dumps(cached_measure()))
