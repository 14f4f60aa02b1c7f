import sys, tempfile, time
import numpy as np, jax, jax.numpy as jnp
from multi_modal_regression_tpu.tools.synthetic import generate_pose_dataset
from multi_modal_regression_tpu.data import (BalancedLoader, ClassBalancedIndex, FlatTestIndex, TestLoader)
from multi_modal_regression_tpu.data.naming import parse_name
from multi_modal_regression_tpu.data.targets import euler_to_pose
from multi_modal_regression_tpu.dictionary.kmeans import fit_kmeans
from multi_modal_regression_tpu.dictionary.gmm import fit_gmm
from multi_modal_regression_tpu.train import Trainer, get_config
from multi_modal_regression_tpu.train.state import create_train_state

CLASSES = ("aeroplane", "bicycle", "boat")
root = tempfile.mkdtemp()
train_root = generate_pose_dataset(f"{root}/train", classes=CLASSES, images_per_class=240, image_size=64, seed=0, pattern="pose")
idx = ClassBalancedIndex(str(train_root), "real", classes=CLASSES)
eulers = []
for c in range(len(CLASSES)):
    for name in idx.list_image_names[c]:
        p = parse_name(name)
        eulers.append((p.az, p.el, p.ct))
y = np.asarray(euler_to_pose(jnp.asarray(np.asarray(eulers, np.float32))))
km = fit_kmeans(y, 16, seed=0)
gm = fit_gmm(y, 16, seed=0)
train_eval_idx = FlatTestIndex(str(train_root), classes=CLASSES)

for preset in sys.argv[1:]:
    ndim = 4 if "quaternion" in preset else 3
    cfg = get_config(preset, feature_network="resnet18", N0=512, N1=64, N2=32, N3=16,
                     dict_size=16, image_size=64, num_classes=3, items_per_batch=8,
                     num_warmup_epochs=2, num_epochs=10, eval_every=0, init_lr=3e-4,
                     compute_dtype="bfloat16")
    d = gm if "probabilistic" in preset else km
    tr = Trainer(cfg, dictionary=d)
    model = tr.model
    x0 = jnp.zeros((2,64,64,3), jnp.float32); l0 = jnp.zeros((2,), jnp.int32)
    from multi_modal_regression_tpu.train.presets import _model_takes_label
    args = (x0, l0) if _model_takes_label(cfg.model_kind) else (x0,)
    variables = jax.jit(lambda k: model.init(k, *args, train=False))(jax.random.PRNGKey(0))
    state = create_train_state(variables, tr.tx)
    real = BalancedLoader(idx, 8, 64, num_workers=4, seed=0)
    render = BalancedLoader(ClassBalancedIndex(str(train_root), "real", classes=CLASSES), 8, 64, num_workers=4, seed=42)
    train_eval = TestLoader(train_eval_idx, 48, 64, num_workers=4)
    med0 = tr.evaluate(state, train_eval)
    t0 = time.time()
    state = tr.fit(state, real, render, test_loader=None)
    med1 = tr.evaluate(state, train_eval)
    print(f"PRESET {preset}: train-view MedErr {med0:.1f} -> {med1:.1f} deg "
          f"({int(state.step)} steps, {time.time()-t0:.0f}s)", flush=True)
