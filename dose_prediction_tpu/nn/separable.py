"""Dense-k7 → separable-k7 checkpoint shim (the documented import path for
TranSeg(k7_mode='separable'), VERDICT r4 next-round #3).

The separable decoder variant (nn/mdunet.py ConvBlockK.separable) replaces
each 343-tap k7 conv with a linear chain of three 1-D convs:

    y = conv_w(conv_h(conv_d(x, A), B), C) + bias

with A: (k,1,1, C_in, C_out) carrying the channel mixing and B/C
channel-diagonal spatial profiles. A trained DENSE kernel
K[d,h,w,ci,co] is projected onto that family by a shared-profile HOSVD:

1. b = leading left-singular vector of K unfolded along h
   c = leading left-singular vector of K unfolded along w
   (one shared 7-vector per axis per conv — exactly what a channel-diagonal
   1-D conv can represent);
2. least-squares A given (b, c):
   A[d,ci,co] = Σ_{h,w} K[d,h,w,ci,co]·b[h]·c[w] / (‖b‖²‖c‖²);
3. B = b ⊗ I, C = c ⊗ I, bias copied to the last conv (the chain is
   linear, so a single trailing bias is exact).

This is the best approximation within the constrained family given the
shared profiles — EXACT when K is of the form A⊗b⊗c (test-pinned), an
approximation otherwise. It is a WARM START: expect to fine-tune. The
relative projection residual per conv is returned so callers can report
fidelity.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def project_dense_kernel(K: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                                 np.ndarray, float]:
    """(A (k,1,1,ci,co), B (1,k,1,co,co), C (1,1,k,co,co), rel_err) for a
    dense kernel K of shape (k,k,k,ci,co)."""
    K = np.asarray(K, np.float64)
    k1, k2, k3, ci, co = K.shape
    # shared spatial profiles: leading left-singular vectors of the unfoldings
    unf_h = K.transpose(1, 0, 2, 3, 4).reshape(k2, -1)
    b = np.linalg.svd(unf_h, full_matrices=False)[0][:, 0]
    unf_w = K.transpose(2, 0, 1, 3, 4).reshape(k3, -1)
    c = np.linalg.svd(unf_w, full_matrices=False)[0][:, 0]
    # sign convention: make the dominant tap positive (pure cosmetics — the
    # signs cancel through the chain, but stable signs help fine-tuning)
    if b[np.argmax(np.abs(b))] < 0:
        b = -b
    if c[np.argmax(np.abs(c))] < 0:
        c = -c
    # least-squares A given (b, c); ||b||=||c||=1 from SVD
    A = np.einsum("dhwio,h,w->dio", K, b, c)
    approx = np.einsum("dio,h,w->dhwio", A, b, c)
    denom = float(np.linalg.norm(K))
    rel_err = float(np.linalg.norm(K - approx)) / (denom if denom else 1.0)
    eye = np.eye(co)
    return (A[:, None, None].astype(np.float32),
            (b[None, :, None, None, None] * eye).astype(np.float32),
            (c[None, None, :, None, None] * eye).astype(np.float32),
            rel_err)


def separabilize_variables(dense_vars: Dict, sep_template: Dict
                           ) -> Tuple[Dict, Dict[str, float]]:
    """Fill a separable-variant variables tree from a dense checkpoint.

    ``dense_vars``: variables of TranSeg(k7_mode='dense') (params [+
    batch_stats]); ``sep_template``: a freshly initialized
    TranSeg(k7_mode='separable') variables tree (provides the target
    structure). Every leaf that exists identically in both trees is copied;
    every ``conv{i}_d/_h/_w`` triple is filled by projecting the dense
    ``conv{i}`` kernel. Returns (variables, {path: rel_err}).
    """
    errors: Dict[str, float] = {}

    def walk(dense: Any, sep: Any, path: List[str]) -> Any:
        if not isinstance(sep, dict):
            return np.asarray(dense)
        out = {}
        handled = set()
        for key in sep:
            if key.endswith("_d") and key[:-2] + "_h" in sep \
                    and key[:-2] + "_w" in sep:
                base = key[:-2]
                if base in handled:
                    continue
                handled.add(base)
                dense_conv = dense.get(base) if isinstance(dense, dict) else None
                if dense_conv is None or "kernel" not in dense_conv:
                    raise KeyError(
                        f"{'/'.join(path)}: separable target {base}_d/_h/_w "
                        f"has no dense source conv '{base}'")
                A, B, C, err = project_dense_kernel(dense_conv["kernel"])
                errors["/".join(path + [base])] = err
                out[base + "_d"] = {"kernel": A}
                out[base + "_h"] = {"kernel": B}
                wtree: Dict[str, np.ndarray] = {"kernel": C}
                if "bias" in sep[base + "_w"]:
                    wtree["bias"] = (
                        np.asarray(dense_conv["bias"], np.float32)
                        if "bias" in dense_conv
                        else np.zeros(C.shape[-1], np.float32))
                out[base + "_w"] = wtree
                continue
            if key.endswith(("_h", "_w")) and key[:-2] + "_d" in sep:
                continue  # filled by the _d branch regardless of visit order
            if not isinstance(dense, dict) or key not in dense:
                raise KeyError(f"{'/'.join(path + [key])}: missing in the "
                               f"dense source checkpoint")
            out[key] = walk(dense[key], sep[key], path + [key])
        return out

    return walk(dense_vars, sep_template, []), errors
