"""Assemble data/flagship_r3.npz from a mid-run DB checkpoint.

The r3 DB retrain (scripts/train_db_r3.py) checkpoints db_best.ctd /
db_last.ctd at every eval epoch; this standalone assembler grafts the
best DB head so far onto the r2 flagship trunk without waiting for the
full schedule (the trainer's own tail does the same thing at natural
completion).  Run on CPU — it only reshuffles host arrays:

    python scripts/assemble_flagship_r3.py [path/to/db_best.ctd]
"""

from __future__ import annotations

import os
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from comic_text_detector_tpu.constants import TEXTDET_DET
    from comic_text_detector_tpu.models.detector import build_train_model
    from comic_text_detector_tpu.training import checkpoint as ckpt_lib
    from comic_text_detector_tpu.training.checkpoint import load_compact, save_compact
    from comic_text_detector_tpu.training.steps import create_db_train_state

    ctd = sys.argv[1] if len(sys.argv) > 1 else osp.join(ROOT, "data", "db_work_r3", "db_best.ctd")
    out_path = os.environ.get("CTD_DB_OUT", osp.join(ROOT, "data", "flagship_r3.npz"))

    # template state with the same tree structure the trainer saved
    model = build_train_model(act="leaky", with_db=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32),
        forward_mode=TEXTDET_DET,
    )
    # tx tree must match the trainer's (db_trainer.py:143-151) for restore
    tx = optax.chain(
        optax.add_decayed_weights(0.0),
        optax.adam(lambda step: 1e-3, b1=0.937, b2=0.999),  # schedule, like the trainer
    )
    state = create_db_train_state(variables, tx)
    payload = ckpt_lib.restore(ctd, state)
    db_state = payload["state"]
    print(f"restored {ctd}: epoch {payload['meta'].get('epoch')} "
          f"best_f1 {payload['meta'].get('best_f1')}")

    deploy = load_compact(osp.join(ROOT, "data", "flagship_r2.npz"))
    deploy["params"]["text_det"] = jax.device_get(db_state.params["dbnet"])
    deploy["batch_stats"]["text_det"] = jax.device_get(db_state.batch_stats["dbnet"])
    save_compact(out_path, deploy)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
