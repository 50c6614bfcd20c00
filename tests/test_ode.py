"""Port of the reference's RK4 test (particle_system.rs:131-150) plus
closest-point checks (monomial_surface.rs:189-250)."""

import math

import numpy as np

from rpt_tpu.ode import (
    MarblesSystem,
    ParticleState,
    SimpleCircleSystem,
    SolidGravitySystem,
    monomial_closest_point,
)
from rpt_tpu.vec import Vec3


def test_rk4_works():
    state = ParticleState.of([[1.0, 0.0, 0.0]], [[0.0, 0.0, 0.0]])
    out = SimpleCircleSystem().rk4_integrate(state, 2.0 * math.pi, 0.005)
    assert np.linalg.norm(out.pos.to_numpy()[0] - [1.0, 0.0, 0.0]) < 1e-3

    state = ParticleState.of([[1.0, 0.0, 0.0]], [[0.0, 0.0, 0.0]])
    out = SimpleCircleSystem().rk4_integrate(state, math.pi, 0.005)
    assert np.linalg.norm(out.pos.to_numpy()[0] - [-1.0, 0.0, 0.0]) < 1e-3


def test_monomial_closest_point():
    # points on the surface map near themselves (monomial_surface.rs:199-203)
    for x, z in [(0.0, 1.0), (0.0, -1.0), (0.23234, 0.723423), (0.12323, -0.23423)]:
        pt = Vec3.from_array(np.array([[x, (x**2 + z**2) ** 2, z]]))
        cp = monomial_closest_point(1.0, pt)
        d = np.linalg.norm(cp.to_numpy() - pt.to_numpy())
        assert d < 0.03, (x, z, d)
    # degenerate origin
    pt = Vec3.from_array(np.array([[0.0, 0.0, 0.0]]))
    cp = monomial_closest_point(1.0, pt)
    assert np.allclose(cp.to_numpy(), 0.0)


def test_gravity_antisymmetry():
    state = ParticleState.of(
        [[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]], [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]]
    )
    d = SolidGravitySystem().time_derivative(state)
    acc = d.vel.to_numpy()
    # equal and opposite, attraction along x
    assert np.allclose(acc[0], -acc[1], atol=1e-6)
    assert acc[0][0] > 0  # particle 0 pulled toward particle 1


def test_marbles_table_support():
    # a marble resting just below table height gets pushed up
    r = 0.3
    state = ParticleState.of([[3.0, r - 0.07, 0.0]], [[0.0, 0.0, 0.0]])
    d = MarblesSystem(r).time_derivative(state)
    assert d.vel.to_numpy()[0][1] > 0.0
