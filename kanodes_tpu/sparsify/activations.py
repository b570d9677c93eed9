"""Per-edge activation extraction for KAN chains.

Rebuild of `Lotka-Volterra/Activation_getter.jl:3-63`: instead of the
matmul-fused layer output, expose each learned scalar function
phi_{i->o}(x_i) — the quantity pruning scores, symbolic regression fits,
and the paper's spline plots all consume. Layer n's activations are
evaluated at layer n-1's outputs, so the whole chain is threaded.

Unlike the reference (which re-implements the layer math by hand and
keeps consistency checks commented out, :33-36), this delegates to
`KDense.edge_activations`, whose sum-over-inputs identity with the fused
forward is enforced by tests/test_kdense.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass
class ChainActivations:
    """inputs[l]: [N, I_l] layer inputs; acts[l]: [N, I_l, O_l] per-edge
    activation values phi_{i->o} evaluated at those inputs."""
    inputs: list
    acts: list

    def edge_curves(self, layer: int, i: int, o: int):
        """(x values, phi(x) values) for edge i->o of a layer — the data
        behind the reference's activation plots and SR targets."""
        return self.inputs[layer][:, i], self.acts[layer][:, i, o]


def chain_activations(chain, params, x: Array) -> ChainActivations:
    """Thread x ([N, in_dims]) through the chain collecting per-edge
    activations at every layer."""
    inputs, acts = [], []
    for layer, p in zip(chain.layers, params):
        a = layer.edge_activations(p, x)      # [N, I, O]
        inputs.append(x)
        acts.append(a)
        x = a.sum(axis=-2)                    # == layer.apply(p, x)
    return ChainActivations(inputs, acts)


def activation_magnitudes(chain, params, x: Array) -> list:
    """max_t |phi_{i->o}(x_i(t))| per edge and layer: [I_l, O_l] arrays.

    This is the score the reference's pruning uses
    (`LV_driver_KANODE.jl:73-84`).
    """
    ca = chain_activations(chain, params, x)
    return [jnp.max(jnp.abs(a), axis=0) for a in ca.acts]
