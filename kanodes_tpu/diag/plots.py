"""Paper-figure plotting.

Rebuild of the reference's plotting layer: training curves + trajectory
reconstruction (`Plotting_standard.jl:135-192`), per-edge activation
spline plots (`Plotting_symbolic.jl:345-411`), PDE contour panels
(`Burgers_Surrogate.jl:110-153`), and the param-efficiency trend figure
(`trend_plotter.py:7-35`). All functions save PNGs and return the
figure; headless (Agg) by default.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def loss_curves(histories: dict[str, np.ndarray], path: str,
                title: str = "training loss"):
    """Log-scale loss curves (Plotting_standard.jl:177-192)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4), dpi=150)
    for label, h in histories.items():
        ax.semilogy(np.asarray(h), label=label, lw=1)
    ax.set_xlabel("iteration")
    ax.set_ylabel("MSE loss")
    ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path)
    return fig


def lv_reconstruction(ts, truth, pred, train_tmax: float, path: str):
    """Fig 3A-style trajectory reconstruction with the train/test split
    line (Plotting_standard.jl:135-155)."""
    plt = _plt()
    ts, truth, pred = map(np.asarray, (ts, truth, pred))
    fig, ax = plt.subplots(figsize=(7, 4), dpi=150)
    for d, (name, color) in enumerate((("x (prey)", "tab:blue"),
                                       ("y (predator)", "tab:red"))):
        ax.plot(ts, truth[:, d], ".", color=color, ms=3,
                label=f"{name} data")
        ax.plot(ts, pred[:, d], "-", color=color, lw=1.2,
                label=f"{name} KAN-ODE")
    ax.axvline(train_tmax, color="k", ls="--", lw=1, label="train cut")
    ax.set_xlabel("t")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path)
    return fig


def activation_grid(chain, params, x_samples, path: str,
                    alpha_scale: bool = True):
    """Per-edge activation curves phi_{i->o}, alpha scaled by magnitude
    (Plotting_symbolic.jl:345-411)."""
    plt = _plt()
    from kanodes_tpu.sparsify.activations import chain_activations

    ca = chain_activations(chain, params, x_samples)
    n_layers = len(ca.acts)
    fig, axes = plt.subplots(1, n_layers, figsize=(5 * n_layers, 4),
                             dpi=150, squeeze=False)
    for l, act in enumerate(ca.acts):
        ax = axes[0][l]
        a = np.asarray(act)
        xin = np.asarray(ca.inputs[l])
        mag = np.abs(a).max(axis=0)
        mmax = mag.max() + 1e-12
        I, O = a.shape[1:]
        for i in range(I):
            order = np.argsort(xin[:, i])
            for o in range(O):
                alpha = float(mag[i, o] / mmax) if alpha_scale else 1.0
                ax.plot(xin[order, i], a[order, i, o], lw=1,
                        alpha=max(alpha, 0.05))
        ax.set_title(f"layer {l + 1} activations")
        ax.set_xlabel("input")
    fig.tight_layout()
    fig.savefig(path)
    return fig


def pde_contour(ts, x, field, path: str, title: str = ""):
    """Space-time contour panel (Burgers_Surrogate.jl:110-153)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 2.6), dpi=150)
    c = ax.contourf(np.asarray(ts), np.asarray(x), np.asarray(field).T,
                    levels=101, cmap="turbo")
    fig.colorbar(c, ax=ax)
    ax.set_xlabel("t")
    ax.set_ylabel("x")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path)
    return fig


def trend_plot(results: list[dict], path: str,
               reference: dict[str, dict] | None = None):
    """Loss-vs-#params trend with N^-4 / N^-2 guide lines
    (trend_plotter.py:7-35). `results` rows: {model, n_params,
    train_loss}."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(5.5, 4.5), dpi=150)
    for model, color, marker in (("kan", "tab:blue", "o"),
                                 ("mlp", "tab:red", "s")):
        pts = [(r["n_params"], r["train_loss"]) for r in results
               if r["model"] == model]
        if pts:
            n, l = zip(*sorted(pts))
            ax.loglog(n, l, marker + "-", color=color,
                      label=f"{model.upper()} (this work)")
    if reference:
        for model, color in (("kan", "tab:blue"), ("mlp", "tab:red")):
            if model in reference:
                n, l = zip(*sorted(reference[model].items()))
                ax.loglog(n, l, "x--", color=color, alpha=0.5,
                          label=f"{model.upper()} (reference)")
    n = np.asarray([60.0, 1000.0])
    ax.loglog(n, 2e2 * n ** -4.0, ":", color="gray", label=r"$N^{-4}$")
    ax.loglog(n, 1e-1 * n ** -2.0, ":", color="black", label=r"$N^{-2}$")
    ax.set_xlabel("# parameters")
    ax.set_ylabel("converged train MSE")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(path)
    return fig


def symbolic_error_contours(kan_rhs, sym_exprs: list[str], truth_rhs,
                            ranges, path: str, n: int = 100):
    """Dense/sparse RHS error contours over an (x, y) mesh — the
    Plotting_symbolic.jl:196-305 comparison: |KAN - truth| and
    |symbolic - truth| per output dimension."""
    plt = _plt()
    import jax.numpy as jnp

    (xlo, xhi), (ylo, yhi) = ranges
    xs = np.linspace(xlo, xhi, n)
    ys = np.linspace(ylo, yhi, n)
    XX, YY = np.meshgrid(xs, ys)
    pts = np.stack([XX.ravel(), YY.ravel()], 1).astype(np.float32)

    kan = np.asarray(kan_rhs(jnp.asarray(pts)))            # [N, 2]
    tru = np.asarray(truth_rhs(pts))                       # [N, 2]
    env = {"x0": pts[:, 0].astype(np.float64),
           "x1": pts[:, 1].astype(np.float64),
           "sin": np.sin, "cos": np.cos, "exp": np.exp,
           "square": np.square}
    sym = np.stack([eval(e, {"__builtins__": {}}, env)     # noqa: S307
                    for e in sym_exprs], axis=1)

    fig, axes = plt.subplots(2, 2, figsize=(10, 8), dpi=150)
    for d in range(2):
        for col, (approx, title) in enumerate(
                ((kan, "|KAN − truth|"), (sym, "|symbolic − truth|"))):
            err = np.abs(approx[:, d] - tru[:, d]).reshape(n, n)
            ax = axes[d][col]
            c = ax.contourf(XX, YY, err, levels=31, cmap="turbo")
            fig.colorbar(c, ax=ax)
            ax.set_title(f"dim {d}: {title}")
    fig.tight_layout()
    fig.savefig(path)
    return fig


def pinn_field_plot(model, params, geo, path: str, n: int = 151):
    """phi and tau_eq contours over the notched plate (the PINN's
    diagnostics panels, StrainLimiting_KAN_PINN.py:1092-1178)."""
    plt = _plt()
    import jax
    import jax.numpy as jnp
    from kanodes_tpu.pinn.losses import stress

    xs = np.linspace(geo.xmin, geo.xmax, n)
    ys = np.linspace(geo.ymin, geo.ymax, n)
    XX, YY = np.meshgrid(xs, ys)
    pts = jnp.asarray(np.stack([XX.ravel(), YY.ravel()], 1), jnp.float32)

    def phi(p):
        return model.phi(params, p)

    vals = np.asarray(jax.vmap(phi)(pts)).reshape(n, n)
    _, _, tau = stress(phi, pts)
    tau = np.asarray(tau).reshape(n, n)
    void = geo.in_void(XX, YY)
    vals = np.where(void, np.nan, vals)
    tau = np.where(void, np.nan, tau)

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5), dpi=150)
    for ax, field, title in ((axes[0], vals, r"$\phi$"),
                             (axes[1], tau, r"$\tau_{eq}$")):
        c = ax.contourf(XX, YY, field, levels=51, cmap="turbo")
        fig.colorbar(c, ax=ax)
        ax.set_title(title)
        ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path)
    return fig
