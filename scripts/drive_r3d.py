"""Round-3 session drive: infer CLI (+Grad-CAM saliency) and async
checkpointing on the real chip."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    print("backend:", jax.default_backend())

    # 1) infer CLI with saliency on TPU (ViT-L depth at tiny token counts)
    from octcubem_tpu.cli import infer
    vol = (np.random.default_rng(0).random((12, 64, 64)) * 255).astype(np.float32)
    np.save("/tmp/drive_vol.npy", vol)
    t0 = time.time()
    probs = infer.main(["/tmp/drive_vol.npy", "--num_frames", "6",
                        "--input_size", "32", "--nb_classes", "4",
                        "--saliency_dir", "/tmp/drive_sal"])
    print(f"infer+cam done in {time.time()-t0:.1f}s, probs finite:",
          bool(np.isfinite(probs).all()))
    print("overlay exists:",
          [f for f in os.listdir("/tmp/drive_sal")])

    # 2) async checkpointing of a real ViT-L-sized state: time the save
    # call (should return ~instantly) vs the sync save, restore matches
    import jax.numpy as jnp
    from octcubem_tpu.core import checkpoint as ckpt
    state = {"w": jax.random.normal(jax.random.key(0), (4096, 4096)),
             "m": jax.random.normal(jax.random.key(1), (4096, 4096)),
             "step": jnp.asarray(7)}
    state = jax.tree.map(lambda x: np.asarray(x), state)  # host pytree
    d_sync, d_async = "/tmp/drive_ck_sync", "/tmp/drive_ck_async"
    import shutil
    for d in (d_sync, d_async):
        shutil.rmtree(d, ignore_errors=True)
    t0 = time.time(); ckpt.save_checkpoint(d_sync, 0, state)
    t_sync = time.time() - t0
    t0 = time.time(); ckpt.save_checkpoint(d_async, 0, state, async_save=True)
    t_return = time.time() - t0
    t0 = time.time(); ckpt.wait_for_saves(d_async)
    t_wait = time.time() - t0
    restored, step = ckpt.restore_raw(d_async)
    ok = np.array_equal(restored["w"], state["w"]) and step == 0
    print(f"ckpt 128MB: sync save {t_sync*1e3:.0f}ms; async returns in "
          f"{t_return*1e3:.0f}ms (background wait {t_wait*1e3:.0f}ms); "
          f"restore exact: {ok}")
    print("DRIVE_OK")


if __name__ == "__main__":
    main()
