import tempfile, time
import numpy as np, jax, jax.numpy as jnp
from multi_modal_regression_tpu.tools.synthetic import generate_pose_dataset
from multi_modal_regression_tpu.data import (BalancedLoader, ClassBalancedIndex, FlatTestIndex, TestLoader)
from multi_modal_regression_tpu.data.naming import parse_name
from multi_modal_regression_tpu.data.targets import euler_to_pose
from multi_modal_regression_tpu.dictionary.kmeans import fit_kmeans
from multi_modal_regression_tpu.train import Trainer, get_config
from multi_modal_regression_tpu.train.state import create_train_state

CLASSES = ("aeroplane", "bicycle", "boat")
root = tempfile.mkdtemp()
train_root = generate_pose_dataset(f"{root}/train", classes=CLASSES, images_per_class=240, image_size=64, seed=0, pattern="pose")
test_root = generate_pose_dataset(f"{root}/test", classes=CLASSES, images_per_class=30, image_size=64, seed=1, pattern="pose")
print("data written", flush=True)

# dictionary from the train poses
eulers = []
idx = ClassBalancedIndex(str(train_root), "real", classes=CLASSES)
for c in range(len(CLASSES)):
    for name in idx.list_image_names[c]:
        p = parse_name(name)
        eulers.append((p.az, p.el, p.ct))
y = np.asarray(euler_to_pose(jnp.asarray(np.asarray(eulers, np.float32))))
d = fit_kmeans(y, 16, seed=0)
print("dict fitted", flush=True)

cfg = get_config("geodesic_bd", feature_network="resnet18", N0=512, N1=64, N2=32,
                 dict_size=16, image_size=64, num_classes=3, items_per_batch=8,
                 num_warmup_epochs=2, num_epochs=30, eval_every=0, init_lr=3e-4,
                 compute_dtype="bfloat16")
tr = Trainer(cfg, dictionary=d)
model = tr.model
x0 = jnp.zeros((2,64,64,3), jnp.float32); l0 = jnp.zeros((2,), jnp.int32)
variables = jax.jit(lambda k: model.init(k, x0, l0, train=False))(jax.random.PRNGKey(0))
state = create_train_state(variables, tr.tx)

real = BalancedLoader(idx, 8, 64, num_workers=4, seed=0)
# no render set: reuse train dir as the "render" side with opposite tilt handled
render = BalancedLoader(ClassBalancedIndex(str(train_root), "real", classes=CLASSES), 8, 64, num_workers=4, seed=42)
test = TestLoader(FlatTestIndex(str(test_root), classes=CLASSES), 48, 64, num_workers=4)

med0 = tr.evaluate(state, test)
print(f"MedErr before: {med0:.2f} deg", flush=True)
t0=time.time()
state = tr.fit(state, real, render, test_loader=None)
print(f"trained {int(state.step)} steps in {time.time()-t0:.0f}s", flush=True)
med1 = tr.evaluate(state, test)
print(f"MedErr after: {med1:.2f} deg (before {med0:.2f})", flush=True)
train_eval = TestLoader(FlatTestIndex(str(train_root), classes=CLASSES), 48, 64, num_workers=4)
med_train = tr.evaluate(state, train_eval)
print(f"MedErr on TRAIN data: {med_train:.2f} deg", flush=True)
assert med1 < med0 * 0.5, "insufficient learning"
print("LEARNING_OK", flush=True)
