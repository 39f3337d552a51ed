"""Checkpoint / resume of closed-loop simulations and controller warm-start state.

The reference has no state serialization at all (SURVEY.md §5): episode records
live in memory and the warm-start tree dies with the process. Here the full
resumable state — controller carry (warm-start inputs, branch probabilities,
OldInput), vehicle/robot states, beliefs, RNG state — round-trips through a
single ``.npz`` file.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import numpy as np


def _flatten(prefix: str, tree: Any, out: Dict[str, np.ndarray]):
    if tree is None:
        out[prefix + "__none"] = np.zeros(0)
        return
    if isinstance(tree, (tuple, list)) and hasattr(tree, "_fields"):
        for name in tree._fields:
            _flatten(f"{prefix}.{name}", getattr(tree, name), out)
        return
    if isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            _flatten(f"{prefix}[{i}]", v, out)
        return
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}{{{k}}}", v, out)
        return
    out[prefix] = np.asarray(tree)


def save_carry(path: str, carry, extra: Dict[str, Any] = None):
    """Serialize a controller carry (any NamedTuple pytree) plus extras."""
    out: Dict[str, np.ndarray] = {}
    _flatten("carry", carry, out)
    if extra:
        for k, v in extra.items():
            _flatten(f"extra.{k}", v, out)
    np.savez(path, **out)


def load_carry(path: str, template):
    """Restore a carry into the structure of ``template`` (same NamedTuple type
    built by the controller's init_carry). Returns (carry, extras dict)."""
    data = dict(np.load(path, allow_pickle=False))

    def rebuild(prefix, tmpl):
        if tmpl is None:
            return None
        if hasattr(tmpl, "_fields"):
            vals = [rebuild(f"{prefix}.{n}", getattr(tmpl, n)) for n in tmpl._fields]
            return type(tmpl)(*vals)
        if isinstance(tmpl, (tuple, list)):
            return type(tmpl)(
                rebuild(f"{prefix}[{i}]", v) for i, v in enumerate(tmpl)
            )
        arr = data[prefix]
        return arr.astype(np.asarray(tmpl).dtype).reshape(np.asarray(tmpl).shape)

    carry = rebuild("carry", template)
    extras = {}
    for k in data:
        if k.startswith("extra."):
            extras[k[len("extra."):]] = data[k]
    return carry, extras


def save_env_state(path: str, env, carry=None):
    """Snapshot a highway/quadruped env (vehicle states, lane/backup indices,
    RNG state) together with the controller carry."""
    extra: Dict[str, Any] = {}
    agents = getattr(env, "veh_set", None) or getattr(env, "robot_set", [])
    extra["agent_states"] = np.stack([a.state for a in agents])
    extra["backupidx"] = np.array([a.backupidx for a in agents])
    if hasattr(agents[0], "laneidx"):
        extra["laneidx"] = np.array([a.laneidx for a in agents])
    if hasattr(env, "b"):
        extra["beliefs"] = np.asarray(env.b)
    if hasattr(env, "rng"):
        state = env.rng.bit_generator.state
        extra["rng_state_json"] = np.frombuffer(
            json.dumps(state).encode(), dtype=np.uint8
        )
    save_carry(path, carry if carry is not None else env.mpc.carry, extra)


def load_env_state(path: str, env, carry_template):
    """Restore an env snapshot in place; returns the controller carry."""
    carry, extra = load_carry(path, carry_template)
    agents = getattr(env, "veh_set", None) or getattr(env, "robot_set", [])
    for i, a in enumerate(agents):
        a.state = extra["agent_states"][i].copy()
        a.backupidx = int(extra["backupidx"][i])
        if "laneidx" in extra and hasattr(a, "laneidx"):
            a.laneidx = int(extra["laneidx"][i])
    if "beliefs" in extra and hasattr(env, "b"):
        env.b = extra["beliefs"].copy()
    if "rng_state_json" in extra and hasattr(env, "rng"):
        state = json.loads(bytes(extra["rng_state_json"]).decode())
        env.rng.bit_generator.state = state
    env.mpc.carry = jax_tree_from(carry)
    return carry


def jax_tree_from(carry):
    import jax.numpy as jnp

    if carry is None:
        return None
    if hasattr(carry, "_fields"):
        return type(carry)(*(jax_tree_from(getattr(carry, n)) for n in carry._fields))
    if isinstance(carry, (tuple, list)):
        return type(carry)(jax_tree_from(v) for v in carry)
    return jnp.asarray(carry)
