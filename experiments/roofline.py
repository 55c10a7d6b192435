"""MXU roofline for the meta inner-loop step: parse the lowered HLO's
convolution ops and bound attainable MFU for this architecture.

The v5e MXU is a 128x128 systolic array: an im2col'd conv
[M=B*Ho*Wo, K=Cin*kh*kw] @ [K, N=Cout] runs in
ceil(M/128)*ceil(K/128)*ceil(N/128) tile passes, so its peak-FLOP
efficiency is bounded by (M*K*N) / (ceil tiles * 128^3). Depthwise convs
never touch the MXU (VPU work, 8x128 vector lanes; counted at the VPU's
~1/16 of MXU bf16 peak). Everything else (BN, swish, optimizer,
augmentation) is bandwidth-bound overhead on top.

Usage: python experiments/roofline.py  (CPU; lowers one loss-and-grad step
at run.sh shapes and prints per-class FLOP shares + the attainable MFU
bound; writes experiments/roofline.json).
"""
import collections
import json
import math
import re
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

INSTR_RE = re.compile(r"^\s*(?:ROOT )?([%\w.-]+) = (\w+)\[([\d,]*)\]")


def ceil128(n):
    return math.ceil(n / 128) * 128


def parse_convs(hlo_text):
    """Yield (out, lhs, rhs, dim_labels, groups) shape tuples per conv."""
    shapes = {}
    convs = []
    for line in hlo_text.splitlines():
        m = INSTR_RE.match(line)
        if not m:
            continue
        name, _, dims = m.groups()
        shapes[name] = [int(d) for d in dims.split(",") if d]
        if " convolution(" in line:
            args = re.search(r"convolution\(([^)]*)\)", line).group(1)
            operands = [a.strip() for a in args.split(",")]
            labels = re.search(r"dim_labels=([\w>-]+)", line).group(1)
            feat = re.search(r"feature_group_count=(\d+)", line)
            groups = int(feat.group(1)) if feat else 1
            convs.append((name, operands, labels, groups))
    for name, operands, labels, groups in convs:
        out = shapes.get(name)
        lhs = shapes.get(operands[0])
        rhs = shapes.get(operands[1])
        if out and lhs and rhs:
            yield out, lhs, rhs, labels, groups


def main():
    from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                           init_model_state,
                                           make_loss_and_grad)
    from mliis_tpu.models.efficientlab import EfficientLab

    img, batch = 224, 8
    model = EfficientLab(n_classes=1, rsd=(2, 4),
                         compute_dtype=jnp.bfloat16)
    loss_cfg = LossConfig(dice=True, l2=True, remat=False)
    opt_cfg = OptimizerConfig(name="sgd")
    state = init_model_state(model, jax.random.PRNGKey(0), img, opt_cfg)
    lag = make_loss_and_grad(model, loss_cfg)

    images = jnp.zeros((batch, img, img, 3), jnp.float32)
    masks = jnp.zeros((batch, img, img, 2), jnp.float32)

    def step(params, bn):
        return lag(params, bn, images, masks, jax.random.PRNGKey(1), 0.5)

    hlo = jax.jit(step).lower(state.params, state.batch_stats) \
        .compiler_ir(dialect="hlo").as_hlo_text()

    classes = collections.Counter()
    attain = collections.Counter()
    rows = []
    for out, lhs, rhs, labels, groups in parse_convs(hlo):
        lhs_l, rhs_l, out_l = re.split(r"_|->", labels)
        kh = rhs[rhs_l.index("0")]
        kw = rhs[rhs_l.index("1")]
        cin = rhs[rhs_l.index("i")]
        cout = rhs[rhs_l.index("o")]
        m_rows = out[out_l.index("b")] * out[out_l.index("0")] \
            * out[out_l.index("1")]
        # rhs is [kh, kw, cin_per_group, cout_total]: no extra groups
        # factor (each output feature sees only its group's cin).
        flops = 2 * m_rows * kh * kw * cin * cout
        if groups > 1 and cin <= 2:
            cls = "depthwise (VPU)"
            eff = 1.0 / 16.0  # VPU MAC rate vs MXU bf16 peak
        else:
            k = kh * kw * cin
            eff = (m_rows * k * cout) / (
                ceil128(m_rows) * ceil128(k) * ceil128(cout))
            cls = "conv 1x1 (MXU)" if kh == kw == 1 else \
                f"conv {kh}x{kw} (MXU)"
        classes[cls] += flops
        attain[cls] += flops / max(eff, 1e-9)
        rows.append((flops, cls, f"{kh}x{kw} cin={cin} cout={cout} "
                     f"M={m_rows} groups={groups} eff={eff:.2f}"))

    total = sum(classes.values())
    mxu_time = sum(attain.values())  # flop-units at peak rate
    print(f"one fwd+bwd inner step: conv FLOPs {total/1e9:.1f} GF "
          f"({len(rows)} convolution ops)")
    print(f"attainable conv-only MFU bound: {total/mxu_time:.3f}")
    for cls, f in classes.most_common():
        print(f"  {cls:20s} {f/total:6.1%} of FLOPs, "
              f"avg MXU eff {f/attain[cls]:.2f}")
    rows.sort(reverse=True)
    print("top convs by FLOPs:")
    for f, cls, desc in rows[:12]:
        print(f"  {f/1e9:7.2f} GF {cls:18s} {desc}")
    out = {
        "config": "EfficientLab-6-3 rsd(2,4) bf16, one fwd+bwd @ bs8 224^2",
        "total_conv_gflops_per_step": round(total / 1e9, 2),
        "attainable_mfu_bound_convs_only": round(total / mxu_time, 4),
        "classes": {c: {"flop_share": round(f / total, 4),
                        "avg_mxu_eff": round(f / attain[c], 4)}
                    for c, f in classes.items()},
        "top_convs": [desc for _, _, desc in rows[:12]],
    }
    with open("/root/repo/experiments/roofline.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote experiments/roofline.json")


if __name__ == "__main__":
    main()
