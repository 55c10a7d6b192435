"""Mesh-sharding tests on the 8-device virtual CPU mesh: sharded train step
semantics (vs. single-device), sharded eval chunks, dryrun entry points."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mliis_tpu.data.synthetic import make_synthetic_store
from mliis_tpu.meta.evaluate import EvalConfig, make_eval_task_fn
from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                       init_model_state)
from mliis_tpu.meta.learners import MetaTrainConfig, make_train_step
from mliis_tpu.parallel.mesh import (make_sharded_eval_chunk,
                                     make_sharded_train_step, make_task_mesh,
                                     replicate_to_mesh)
from tests.tiny_model import TinySeg

IMG = 16


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest should force 8 CPU devices"
    store = make_synthetic_store(num_tasks=8, examples_per_task=10,
                                 image_size=IMG, seed=0)
    model = TinySeg()
    loss_cfg = LossConfig(l2=False)
    opt_cfg = OptimizerConfig(name="sgd")
    state = init_model_state(model, jax.random.PRNGKey(0), IMG, opt_cfg)
    return store, model, loss_cfg, opt_cfg, state


def _np_snapshot(tree):
    return [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(tree)]


def test_sharded_fomaml_star_step(setup):
    store, model, loss_cfg, opt_cfg, state = setup
    before = _np_snapshot(state.params)
    mesh = make_task_mesh(8)
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=3, inner_iters=3,
                          meta_batch_size=5, foml=True, tail_shots=2,
                          augment=False)
    step = make_sharded_train_step(model, loss_cfg, opt_cfg, cfg, n_max=10,
                                   mesh=mesh)
    # Donation-safe owned copy (replicate_to_mesh aliases on a shared device).
    state_r = replicate_to_mesh(jax.tree_util.tree_map(jnp.array, state), mesh)
    args = replicate_to_mesh((jnp.asarray(store.images),
                              jnp.asarray(store.masks),
                              jnp.asarray(store.counts)), mesh)
    out = step(state_r, *args, jax.random.PRNGKey(1), jnp.float32(0.1),
               jnp.float32(0.01))
    for leaf in jax.tree_util.tree_leaves(out.params):
        assert np.isfinite(np.asarray(leaf)).all()
    deltas = [float(np.abs(np.asarray(a) - b).max())
              for a, b in zip(jax.tree_util.tree_leaves(out.params), before)]
    assert max(deltas) > 0


def test_sharded_reptile_zero_step_identity(setup):
    store, model, loss_cfg, opt_cfg, state = setup
    before = _np_snapshot(state.params)
    mesh = make_task_mesh(4)
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=3, inner_iters=2,
                          meta_batch_size=3, foml=False, augment=False)
    step = make_sharded_train_step(model, loss_cfg, opt_cfg, cfg, n_max=10,
                                   mesh=mesh)
    state_r = replicate_to_mesh(jax.tree_util.tree_map(jnp.array, state), mesh)
    args = replicate_to_mesh((jnp.asarray(store.images),
                              jnp.asarray(store.masks),
                              jnp.asarray(store.counts)), mesh)
    out = step(state_r, *args, jax.random.PRNGKey(1), jnp.float32(0.0),
               jnp.float32(0.01))
    for a, b in zip(jax.tree_util.tree_leaves(out.params), before):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)


@pytest.mark.parametrize("foml,tail", [(False, None), (True, 2)])
def test_sharded_train_step_matches_unsharded(setup, foml, tail):
    """Slot-indexed task/key sampling makes the mesh-sharded meta-step
    numerically identical to learners.make_train_step under the same key
    (up to psum reduction order) — including a padded mesh (m=5 on 8
    devices, 3 zero-weight slots)."""
    store, model, loss_cfg, opt_cfg, state = setup
    mesh = make_task_mesh(8)
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=3, inner_iters=2,
                          meta_batch_size=5, foml=foml, tail_shots=tail,
                          augment=False)
    sharded = make_sharded_train_step(model, loss_cfg, opt_cfg, cfg,
                                      n_max=10, mesh=mesh)
    plain = jax.jit(make_train_step(model, loss_cfg, opt_cfg, cfg, n_max=10))
    imgs, msks, cnts = (jnp.asarray(store.images), jnp.asarray(store.masks),
                        jnp.asarray(store.counts))
    key = jax.random.PRNGKey(42)
    b = plain(state, imgs, msks, cnts, key, jnp.float32(0.3),
              jnp.float32(0.01))
    state_r = replicate_to_mesh(jax.tree_util.tree_map(jnp.array, state),
                                mesh)
    args_r = replicate_to_mesh((imgs, msks, cnts), mesh)
    a = sharded(state_r, *args_r, key, jnp.float32(0.3), jnp.float32(0.01))
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(a.batch_stats),
                    jax.tree_util.tree_leaves(b.batch_stats)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_sharded_eval_chunk_matches_unsharded(setup):
    """Sharded and unsharded eval must produce identical IoUs for identical
    keys (pure functions of the same inputs)."""
    store, model, loss_cfg, opt_cfg, state = setup
    mesh = make_task_mesh(8)
    cfg = EvalConfig(num_shots=5, test_shots=5, inner_batch_size=4,
                     inner_iters=2, augment=False, task_chunk_size=8)
    sharded = make_sharded_eval_chunk(model, loss_cfg, opt_cfg, cfg,
                                      n_max=10, mesh=mesh)
    eval_task = make_eval_task_fn(model, loss_cfg, opt_cfg, cfg, n_max=10)
    unsharded = jax.jit(jax.vmap(eval_task,
                                 in_axes=(None, 0, 0, 0, 0, None, None, None)))
    imgs = jnp.asarray(store.images)
    msks = jnp.asarray(store.masks)
    cnts = jnp.asarray(store.counts)
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    a = sharded(state, imgs, msks, cnts, keys, jnp.float32(0.01),
                jnp.float32(0.0), None)
    b = unsharded(state, imgs, msks, cnts, keys, jnp.float32(0.01),
                  jnp.float32(0.0), None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_chained_eval_chunk_matches_unsharded(setup):
    """chain_chunk under a task mesh (lax.map over each device's local
    chunk slice) must reproduce the vmapped sharded chunk exactly —
    --mesh_tasks must not silently discard --chain_eval_chunk."""
    store, model, loss_cfg, opt_cfg, state = setup
    mesh = make_task_mesh(4)
    base = dict(num_shots=5, test_shots=5, inner_batch_size=4,
                inner_iters=2, augment=False, task_chunk_size=8)
    chained = make_sharded_eval_chunk(
        model, loss_cfg, opt_cfg, EvalConfig(chain_chunk=True, **base),
        n_max=10, mesh=mesh)
    vmapped = make_sharded_eval_chunk(
        model, loss_cfg, opt_cfg, EvalConfig(chain_chunk=False, **base),
        n_max=10, mesh=mesh)
    imgs = jnp.asarray(store.images)
    msks = jnp.asarray(store.masks)
    cnts = jnp.asarray(store.counts)
    keys = jax.random.split(jax.random.PRNGKey(5), 8)
    a = chained(state, imgs, msks, cnts, keys, jnp.float32(0.01),
                jnp.float32(0.0), None)
    b = vmapped(state, imgs, msks, cnts, keys, jnp.float32(0.01),
                jnp.float32(0.0), None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 224, 224, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_data_parallel_joint_step_matches_unsharded(use_pallas):
    """The joint trainer's data-parallel launch (batch sharded over a "data"
    mesh axis, pmean'd grads, sync-BN) must match the unsharded full-batch
    launch bit-for-spec: same gathered samples, same per-global-sample
    augmentation keys, full-batch BN moments via pmean — the end-to-end
    driver for the cross_replica_sum parity (utils.py:96-134). Covers both
    augmentation branches: jnp and the Pallas cheap-pass kernel (the TPU
    default; interpret mode here) — each must seed per GLOBAL sample."""
    from mliis_tpu.joint.trainer import (JointTrainConfig, JointTrainer,
                                         joint_dataset_from_task_store)
    from mliis_tpu.parallel.mesh import make_data_mesh

    store = make_synthetic_store(num_tasks=4, examples_per_task=6,
                                 image_size=IMG, seed=1)
    ds = joint_dataset_from_task_store(store)
    opt_cfg = OptimizerConfig("sgd")
    cfg = JointTrainConfig(batch_size=8, augment=True, l2=False,
                           steps_per_launch=3, use_pallas_augment=use_pallas)

    plain_model = TinySeg(n_output_channels=ds.num_classes + 1)
    sync_model = TinySeg(n_output_channels=ds.num_classes + 1,
                         bn_axis_name="data")
    state = init_model_state(plain_model, jax.random.PRNGKey(0), IMG, opt_cfg)

    plain = JointTrainer(plain_model, ds, ds, cfg, opt_cfg)
    mesh = make_data_mesh(4)
    sharded = JointTrainer(sync_model, ds, ds, cfg, opt_cfg, mesh=mesh)

    n = ds.num_examples
    key = jax.random.PRNGKey(7)
    batch_idx = jax.random.randint(key, (3, cfg.batch_size), 0, n)
    keys = jax.random.split(jax.random.PRNGKey(8), 3)

    ref_state, ref_losses = plain._train_launch(
        jax.tree_util.tree_map(jnp.array, state), batch_idx, keys,
        jnp.float32(0.01))
    out_state, out_losses = sharded._train_launch(
        jax.tree_util.tree_map(jnp.array, state), batch_idx, keys,
        jnp.float32(0.01))

    np.testing.assert_allclose(np.asarray(out_losses),
                               np.asarray(ref_losses), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out_state.batch_stats),
                    jax.tree_util.tree_leaves(ref_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_joint_trainer_mesh_requires_sync_bn_model():
    from mliis_tpu.joint.trainer import (JointTrainConfig, JointTrainer,
                                         joint_dataset_from_task_store)
    from mliis_tpu.parallel.mesh import make_data_mesh
    store = make_synthetic_store(num_tasks=2, examples_per_task=4,
                                 image_size=IMG, seed=2)
    ds = joint_dataset_from_task_store(store)
    with pytest.raises(AssertionError):
        JointTrainer(TinySeg(n_output_channels=ds.num_classes + 1), ds, ds,
                     JointTrainConfig(batch_size=8, use_pallas_augment=False),
                     OptimizerConfig("sgd"), mesh=make_data_mesh(4))


def test_sync_bn_matches_full_batch():
    """bn_axis_name sync-BN: a batch sharded over a "data" mesh axis must
    produce the same normalized output and updated moving stats as the
    unsharded full batch (the cross_replica_sum parity, utils.py:96-134)."""
    import flax.linen as nn_
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    from mliis_tpu.models import layers

    class BN(nn_.Module):
        axis_name: str = None

        @nn_.compact
        def __call__(self, x, use_running_average: bool):
            return layers.batch_norm(x, not use_running_average,
                                     axis_name=self.axis_name)

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 3)) * 3.0 + 1.0

    plain = BN()
    sync = BN(axis_name="data")
    variables = plain.init(jax.random.PRNGKey(1), x,
                           use_running_average=False)

    ref, ref_mut = plain.apply(variables, x, use_running_average=False,
                               mutable=["batch_stats"])

    def shard_fn(v, xs):
        out, mut = sync.apply(v, xs, use_running_average=False,
                              mutable=["batch_stats"])
        return out, mut

    sharded = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data")), out_specs=(P("data"), P()),
        check_vma=False))
    out, mut = sharded(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mut),
                    jax.tree_util.tree_leaves(ref_mut)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("n_task,n_data,foml,tail,chain_local", [
    (2, 4, False, None, False),
    (4, 2, True, 2, False),
    (2, 2, True, 2, True),  # 2D + chained local slots (meta_batch 3 on 2)
])
def test_2d_task_data_mesh_matches_unsharded(setup, n_task, n_data, foml,
                                             tail, chain_local):
    """(task, data) mesh: the meta-batch shards over the task axis while
    every inner-loop batch splits over the data axis (sync-BN + axis-aware
    loss + global-position augmentation keys + pmean'd grads). Must match
    the single-device step up to reduction order — WITH augmentation on,
    exercising the sharded per-sample key derivation, and with the dice and
    l2 loss terms on, exercising the axis-aware reductions and the
    replicated-parameter-term gradient scale."""
    from mliis_tpu.parallel.mesh import make_task_data_mesh
    store, _, _, opt_cfg, _ = setup
    loss_cfg = LossConfig(dice=True, l2=True)
    plain_model = TinySeg()
    synced_model = TinySeg(bn_axis_name="data")
    state = init_model_state(plain_model, jax.random.PRNGKey(0), IMG, opt_cfg)
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=4, inner_iters=3,
                          meta_batch_size=3, foml=foml, tail_shots=tail,
                          augment=True, aug_rate=0.7)
    mesh = make_task_data_mesh(n_task, n_data)
    sharded = make_sharded_train_step(synced_model, loss_cfg, opt_cfg, cfg,
                                      n_max=10, mesh=mesh,
                                      chain_local=chain_local)
    plain = jax.jit(make_train_step(plain_model, loss_cfg, opt_cfg, cfg,
                                    n_max=10))
    imgs, msks, cnts = (jnp.asarray(store.images), jnp.asarray(store.masks),
                        jnp.asarray(store.counts))
    key = jax.random.PRNGKey(7)
    b = plain(state, imgs, msks, cnts, key, jnp.float32(0.3),
              jnp.float32(0.01))
    state_r = replicate_to_mesh(jax.tree_util.tree_map(jnp.array, state),
                                mesh)
    args_r = replicate_to_mesh((imgs, msks, cnts), mesh)
    a = sharded(state_r, *args_r, key, jnp.float32(0.3), jnp.float32(0.01))
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(a.batch_stats),
                    jax.tree_util.tree_leaves(b.batch_stats)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_train_gecko_2d_mesh_smoke(setup, tmp_path):
    """train_gecko drives the 2D (task, data) mesh end-to-end: mesh_data > 1
    swaps the training model for a sync-BN copy while the eval-interval
    evaluators keep the plain model on a task-only mesh."""
    from mliis_tpu.meta.train import TrainLoopConfig, train_gecko
    store, model, loss_cfg, opt_cfg, state = setup
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=4, inner_iters=2,
                          meta_batch_size=3, foml=True, tail_shots=2,
                          augment=True, aug_rate=0.5)
    loop = TrainLoopConfig(meta_iters=2, eval_interval=1,
                           num_tasks_to_eval=2, eval_inner_iters=2,
                           eval_inner_batch_size=4, num_eval_shots=4,
                           mesh_tasks=4, mesh_data=2,
                           save_checkpoint_every_n_meta_iters=100)
    out = train_gecko(model, jax.tree_util.tree_map(jnp.array, state),
                      store, store, str(tmp_path), loss_cfg, opt_cfg, cfg,
                      loop, jax.random.PRNGKey(0), log_fn=lambda *a: None,
                      eval_task_chunk_size=8)
    for leaf in jax.tree_util.tree_leaves(out.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_sharded_chain_local_matches_vmapped(setup):
    """chain_local=True (each device runs its local task slots via lax.map,
    the sharded form of the chained step) must equal the vmapped sharded
    step exactly — meta_batch 6 on 4 devices, so devices really chain 2."""
    store, model, loss_cfg, opt_cfg, state = setup
    mesh = make_task_mesh(4)
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=3, inner_iters=2,
                          meta_batch_size=6, foml=True, tail_shots=2,
                          augment=True, aug_rate=0.5)
    kwargs = dict(n_max=10, mesh=mesh)
    chained = make_sharded_train_step(model, loss_cfg, opt_cfg, cfg,
                                      chain_local=True, **kwargs)
    vmapped = make_sharded_train_step(model, loss_cfg, opt_cfg, cfg,
                                      **kwargs)
    imgs, msks, cnts = (jnp.asarray(store.images), jnp.asarray(store.masks),
                        jnp.asarray(store.counts))
    key = jax.random.PRNGKey(11)
    args = replicate_to_mesh((imgs, msks, cnts), mesh)
    a = chained(replicate_to_mesh(jax.tree_util.tree_map(jnp.array, state),
                                  mesh),
                *args, key, jnp.float32(0.3), jnp.float32(0.01))
    b = vmapped(replicate_to_mesh(jax.tree_util.tree_map(jnp.array, state),
                                  mesh),
                *args, key, jnp.float32(0.3), jnp.float32(0.01))
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_spatial_sharded_forward_matches_unsharded(setup):
    """GSPMD spatial partitioning (image H axis sharded over the mesh):
    XLA's inserted halo exchanges must reproduce the single-device forward
    — the domain's sequence-parallelism analogue (SURVEY.md §2.2/§5)."""
    from mliis_tpu.parallel.spatial import (make_spatial_forward,
                                            make_spatial_mesh, shard_spatial)
    store, model, loss_cfg, opt_cfg, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    images = jnp.asarray(store.images[0, :4]).astype(jnp.float32)  # [4,16,16,3]
    _, ref = model.apply(variables, images, train=False)

    mesh = make_spatial_mesh(4)
    fwd = make_spatial_forward(model, mesh)
    out = fwd(variables, shard_spatial(images, mesh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # The output really is H-sharded across the mesh, not gathered.
    shards = out.sharding
    assert getattr(shards, "spec", None) is not None


def test_spatial_sharded_train_step_matches_unsharded(setup):
    """Spatial sharding extends to TRAINING via GSPMD's automatic
    partitioning: one loss-and-grad SGD step on H-sharded images (BN batch
    moments reduce over the sharded axis — XLA inserts the psums) equals
    the single-device step."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mliis_tpu.meta.inner_loop import (apply_optimizer,
                                           make_loss_and_grad)
    from mliis_tpu.parallel.spatial import (SPATIAL_AXIS, make_spatial_mesh,
                                            shard_spatial)
    store, model, loss_cfg, opt_cfg, state = setup
    images = jnp.asarray(store.images[0, :4]).astype(jnp.float32)
    masks = jnp.stack([255.0 - store.masks[0, :4],
                       jnp.asarray(store.masks[0, :4], jnp.float32)],
                      -1) / 255.0
    loss_and_grad = make_loss_and_grad(model, loss_cfg)

    def step(params, bn, imgs, msks):
        (loss, new_bn), grads = loss_and_grad(params, bn, imgs, msks,
                                              jax.random.PRNGKey(0),
                                              jnp.float32(0.0))
        new_params, _ = apply_optimizer(params, grads, state.opt,
                                        jnp.float32(0.01), opt_cfg)
        return loss, new_params, new_bn

    ref_loss, ref_params, ref_bn = jax.jit(step)(
        state.params, state.batch_stats, images, masks)

    mesh = make_spatial_mesh(4)
    sharded_imgs = shard_spatial(images, mesh)
    sharded_msks = jax.device_put(
        masks, NamedSharding(mesh, P(None, SPATIAL_AXIS, None, None)))
    rep = NamedSharding(mesh, P())
    sp_step = jax.jit(step, in_shardings=(
        rep, rep, NamedSharding(mesh, P(None, SPATIAL_AXIS, None, None)),
        NamedSharding(mesh, P(None, SPATIAL_AXIS, None, None))))
    out_loss, out_params, out_bn = sp_step(
        jax.device_put(state.params, rep),
        jax.device_put(state.batch_stats, rep), sharded_imgs, sharded_msks)
    np.testing.assert_allclose(float(out_loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out_params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out_bn),
                    jax.tree_util.tree_leaves(ref_bn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_2d_mesh_guards(setup):
    """Misconfigured 2D meshes fail loudly: indivisible inner batch, missing
    sync-BN axis on the model, mesh_data without mesh_tasks."""
    from mliis_tpu.parallel.mesh import make_task_data_mesh
    from mliis_tpu.meta.train import TrainLoopConfig, train_gecko
    store, model, loss_cfg, opt_cfg, state = setup
    mesh = make_task_data_mesh(2, 2)
    bad_batch = MetaTrainConfig(num_shots=6, inner_batch_size=3,
                                inner_iters=2, meta_batch_size=2,
                                augment=False)
    with pytest.raises(AssertionError, match="multiple of the data-mesh"):
        make_sharded_train_step(TinySeg(bn_axis_name="data"), loss_cfg,
                                opt_cfg, bad_batch, n_max=10, mesh=mesh)
    ok_batch = MetaTrainConfig(num_shots=6, inner_batch_size=4,
                               inner_iters=2, meta_batch_size=2,
                               augment=False)
    with pytest.raises(AssertionError, match="bn_axis_name"):
        make_sharded_train_step(TinySeg(), loss_cfg, opt_cfg, ok_batch,
                                n_max=10, mesh=mesh)
    with pytest.raises(ValueError, match="mesh_data > 1 requires"):
        train_gecko(model, state, store, store, "/tmp/never_used",
                    loss_cfg, opt_cfg, ok_batch,
                    TrainLoopConfig(meta_iters=1, mesh_tasks=0, mesh_data=2),
                    jax.random.PRNGKey(0), log_fn=lambda *a: None)
