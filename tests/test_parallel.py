"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import math

import jax
import numpy as np

import rpt_tpu as rpt
from rpt_tpu.parallel import make_mesh, render_sharded


def _sphere_scene():
    scene = rpt.Scene()
    scene.add(rpt.Object(rpt.sphere()))
    scene.add(
        rpt.Object(rpt.plane((0, 1, 0), -1.0)).material(
            rpt.Material.diffuse(rpt.hex_color(0xAAAAAA))
        )
    )
    scene.add(
        rpt.Light.Object(
            rpt.Object(rpt.sphere().scale((2, 2, 2)).translate((0, 12, 0))).material(
                rpt.Material.light(rpt.hex_color(0xFFFFFF), 40.0)
            )
        )
    )
    return scene


def test_render_sharded_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    scene = _sphere_scene().compile()
    camera = rpt.Camera.look_at((-2.5, 4, 6.5), (0, -0.25, 0), (0, 1, 0), math.pi / 4)
    key = jax.random.key(7)

    w, h, spp = 40, 24, 4
    mesh1 = make_mesh(1, sp=1)
    out1 = render_sharded(scene, camera, w, h, spp, 2, mesh1, key)
    mesh8 = make_mesh(8, sp=2)
    out8 = render_sharded(scene, camera, w, h, spp, 2, mesh8, key)

    # different sample-index partitions use different RNG streams, so images
    # agree statistically, not bitwise: compare means
    m1, m8 = out1.mean(), out8.mean()
    assert np.isfinite(out8).all()
    assert abs(m1 - m8) / max(m1, 1e-9) < 0.15

    # same mesh shape twice must be bit-identical (deterministic RNG)
    out8b = render_sharded(scene, camera, w, h, spp, 2, mesh8, key)
    assert np.array_equal(out8, out8b)


def test_sharded_photon_shooting():
    import rpt_tpu.integrators.photon as ph
    from rpt_tpu.parallel import shoot_photons_sharded

    scene = rpt.Scene()
    white = rpt.Material.diffuse(rpt.hex_color(0xAAAAAA))
    floor = rpt.polygon([(0, 0, 0), (0, 0, 10), (10, 0, 10), (10, 0, 0)])
    light = rpt.polygon([(6, 9.9, 4), (6, 9.9, 6), (4, 9.9, 6), (4, 9.9, 4)])
    scene.add(rpt.Object(floor).material(white))
    scene.add((light, rpt.Material.light(rpt.hex_color(0xFFFFFF), 50.0)))
    cs = scene.compile()

    key = jax.random.key(0)
    n_ph = 20_000  # enough photons that the MC tolerance below is tight
    s1, v1 = ph.shoot_photons(cs, cs.tables, key, n_ph, 100.0, ph.PHOTON_MAP)
    mesh = make_mesh(8, sp=2)
    s8, v8 = shoot_photons_sharded(cs, key, n_ph, 100.0, ph.PHOTON_MAP, mesh)
    # single-device and sharded runs use different RNG streams, so deposit
    # counts/energy agree statistically; at 20k photons the relative MC
    # error of these sums is ~1%, so 8% catches any systematic factor
    # (double-count, missing shard, wrong power split). The bitwise test
    # below pins the sharding math itself.
    assert abs(len(s8) - len(s1)) / max(len(s1), 1) < 0.08
    e1 = np.linalg.norm(s1[:, 6:9], axis=1).sum()
    e8 = np.linalg.norm(s8[:, 6:9], axis=1).sum()
    assert abs(e8 - e1) / e1 < 0.08


def test_sharded_photon_shooting_exact_rows():
    """Bitwise check: driving the single-device launch with the same
    per-device key folding must reproduce the sharded row set exactly —
    a sharding bug cannot hide inside statistical tolerances."""
    import rpt_tpu.integrators.photon as ph
    from rpt_tpu.parallel import shoot_photons_sharded

    scene = rpt.Scene()
    white = rpt.Material.diffuse(rpt.hex_color(0xAAAAAA))
    floor = rpt.polygon([(0, 0, 0), (0, 0, 10), (10, 0, 10), (10, 0, 0)])
    light = rpt.polygon([(6, 9.9, 4), (6, 9.9, 6), (4, 9.9, 6), (4, 9.9, 4)])
    scene.add(rpt.Object(floor).material(white))
    scene.add((light, rpt.Material.light(rpt.hex_color(0xFFFFFF), 50.0)))
    cs = scene.compile()

    key = jax.random.key(11)
    photon_count, watts, max_depth = 1000, 100.0, 48
    mesh = make_mesh(8, sp=2)
    s8, v8 = shoot_photons_sharded(
        cs, key, photon_count, watts, ph.PHOTON_MAP, mesh, max_depth=max_depth
    )

    n_dev = 8
    per_dev = -(-photon_count // n_dev)
    li, _ = ph._find_object_light(cs)
    launch = ph._shoot_launch(
        cs, li, watts / (n_dev * per_dev), ph.PHOTON_MAP, max_depth, per_dev
    )
    parts = []
    for dev in range(n_dev):
        s_buf, s_count, _, _ = launch.raw(cs.tables, jax.random.fold_in(key, dev))
        parts.append(np.asarray(s_buf)[: min(int(s_count), launch.s_cap)])
    expected = np.concatenate(parts)
    assert s8.shape == expected.shape
    np.testing.assert_array_equal(s8, expected)


def test_photon_render_sharded_matches_single_device():
    """The sharded photon CAMERA pass (pixel blocks over dp, samples over
    sp, map replicated — photon.rs:704-717 analog) must reproduce the
    single-device estimate: dp partitioning folds RNG by global pixel id
    and sp partitioning folds by global sample index, so the sampled
    values are the same up to psum summation order."""
    import rpt_tpu.integrators.photon as ph
    from rpt_tpu.parallel import photon_render_sharded, shoot_photons_sharded

    scene = rpt.Scene()
    white = rpt.Material.diffuse(rpt.hex_color(0xAAAAAA))
    floor = rpt.polygon([(0, 0, 0), (0, 0, 10), (10, 0, 10), (10, 0, 0)])
    wall = rpt.polygon([(0, 0, 0), (10, 0, 0), (10, 10, 0), (0, 10, 0)])
    light = rpt.polygon([(6, 9.9, 4), (6, 9.9, 6), (4, 9.9, 6), (4, 9.9, 4)])
    scene.add(rpt.Object(floor).material(white))
    scene.add(rpt.Object(wall).material(white))
    scene.add((light, rpt.Material.light(rpt.hex_color(0xFFFFFF), 50.0)))
    cs = scene.compile()

    key = jax.random.key(5)
    camera = rpt.Camera.look_at((5, 5, 14), (5, 5, 0), (0, 1, 0), math.pi / 3)
    mesh8 = make_mesh(8, sp=2)
    surface, volume = shoot_photons_sharded(
        cs, key, 4000, 100.0, ph.PHOTON_MAP, mesh8
    )
    pmap = ph.build_photon_map(
        cs, cs.tables, surface, volume, ph.PHOTON_MAP, 8, 8,
        np.random.default_rng(17),
    )

    w, h, spp = 24, 16, 2
    out1 = photon_render_sharded(
        cs, camera, w, h, spp, pmap, ph.PHOTON_MAP, 8, 8, make_mesh(1, sp=1), key
    )
    out8 = photon_render_sharded(
        cs, camera, w, h, spp, pmap, ph.PHOTON_MAP, 8, 8, mesh8, key
    )
    assert np.isfinite(out8).all()
    assert out8.mean() > 0, "photon estimate should be nonzero"
    np.testing.assert_allclose(out8, out1, rtol=1e-4, atol=1e-5)


def test_dp_only_mesh_bitwise_matches_single():
    """Pixel sharding alone must not change any sampled value."""
    scene = _sphere_scene().compile()
    camera = rpt.Camera.look_at((-2.5, 4, 6.5), (0, -0.25, 0), (0, 1, 0), math.pi / 4)
    key = jax.random.key(3)
    w, h, spp = 32, 16, 2
    out1 = render_sharded(scene, camera, w, h, spp, 2, make_mesh(1, sp=1), key)
    out4 = render_sharded(scene, camera, w, h, spp, 2, make_mesh(4, sp=1), key)
    assert np.allclose(out1, out4, atol=1e-5)
