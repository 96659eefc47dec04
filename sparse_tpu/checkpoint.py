"""Checkpoint / resume (SURVEY §5): the reference ships only a custom npz
(`save_npz`/`load_npz`, mirrored in ``sparse_tpu._io``); the TPU-native
addition is **sharded** checkpointing of distributed sparse operands via
orbax/tensorstore — each chip writes its own row-block shard, and restore
re-places shards onto a (possibly different-sized) mesh.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax

from .parallel.sharding import PartitionedCOO


def save_partitioned(path, pcoo: PartitionedCOO):
    """Save a PartitionedCOO (sharded or host) with orbax; falls back to an
    npz per-shard layout if orbax is unavailable."""
    os.makedirs(path, exist_ok=True)
    meta = {
        "shape": list(pcoo.shape),
        "block_rows": int(pcoo.block_rows),
        "n_shards": int(pcoo.n_shards),
        "row_starts": [int(r) for r in getattr(pcoo, "row_starts", [])] or None,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.join(os.path.abspath(path), "arrays"),
            {"rows": pcoo.rows, "cols": pcoo.cols, "data": pcoo.data},
            force=True,
        )
        ckptr.wait_until_finished()
    except Exception:
        np.savez_compressed(
            os.path.join(path, "arrays.npz"),
            rows=np.asarray(pcoo.rows),
            cols=np.asarray(pcoo.cols),
            data=np.asarray(pcoo.data),
        )


def load_partitioned(path, mesh=None, axis_name="x") -> PartitionedCOO:
    """Restore a PartitionedCOO; if ``mesh`` is given, shards are placed
    with a ``(axis_name, None)`` sharding on it."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)

    arrays = None
    arr_dir = os.path.join(os.path.abspath(path), "arrays")
    if os.path.isdir(arr_dir):
        try:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            if mesh is not None:
                # restore DIRECTLY onto the target mesh sharding (each
                # process reads only its addressable shards — required in
                # multi-process runs, where a replicated restore would
                # produce arrays this process cannot even np.asarray)
                try:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    sh = NamedSharding(mesh, P(axis_name, None))
                    md = ckptr.metadata(arr_dir)
                    md = getattr(md, "item_metadata", md)  # StepMetadata wrapper
                    abstract = jax.tree_util.tree_map(
                        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sh), md
                    )
                    arrays = ckptr.restore(arr_dir, abstract)
                    pcoo = PartitionedCOO(
                        arrays["rows"], arrays["cols"], arrays["data"], tuple(meta["shape"]), meta["block_rows"]
                    )
                    if meta.get("row_starts"):
                        pcoo.row_starts = np.asarray(meta["row_starts"], dtype=np.int64)
                    return pcoo
                except Exception:
                    # In multi-process runs the npz fallback below does not
                    # exist for orbax-written checkpoints (each process only
                    # wrote device shards) — re-raise the REAL restore error
                    # instead of surfacing an unrelated FileNotFoundError.
                    if jax.process_count() > 1:
                        raise
                    arrays = None
            if arrays is None and jax.process_count() == 1:
                arrays = ckptr.restore(arr_dir)
        except ImportError:
            # Multi-process checkpoints are orbax-written per-process device
            # shards — the arrays.npz fallback below does not exist for
            # them; falling through would surface an unrelated
            # FileNotFoundError.
            if jax.process_count() > 1:
                raise ImportError(
                    "orbax-checkpoint is required to restore multi-process "
                    "checkpoints (each process wrote only its device shards; "
                    "there is no single-file npz fallback)"
                )
            arrays = None
        except Exception:
            if jax.process_count() > 1:
                raise
            arrays = None
    if arrays is None:
        with np.load(os.path.join(path, "arrays.npz")) as fp:
            arrays = {"rows": fp["rows"], "cols": fp["cols"], "data": fp["data"]}

    rows = np.asarray(arrays["rows"])
    cols = np.asarray(arrays["cols"])
    data = np.asarray(arrays["data"])
    if mesh is not None:
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(axis_name, None))
        rows = jax.device_put(jnp.asarray(rows), sh)
        cols = jax.device_put(jnp.asarray(cols), sh)
        data = jax.device_put(jnp.asarray(data), sh)
    pcoo = PartitionedCOO(rows, cols, data, tuple(meta["shape"]), meta["block_rows"])
    if meta.get("row_starts"):
        pcoo.row_starts = np.asarray(meta["row_starts"], dtype=np.int64)
    return pcoo
