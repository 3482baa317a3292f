"""Golden tests for core math against hand-computed values and the
reference's documented semantics (matrix_math.h, AABB.h)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.core import vecmath as vm


def test_normalize():
    v = vm.vec3(3.0, 0.0, 4.0)
    n = np.asarray(vm.normalize(v))
    np.testing.assert_allclose(n, [0.6, 0.0, 0.8], atol=1e-6)


def test_coordinate_system_orthonormal():
    rng = np.random.RandomState(0)
    v1 = rng.randn(32, 3).astype(np.float32)
    v1 /= np.linalg.norm(v1, axis=-1, keepdims=True)
    v2, v3 = vm.coordinate_system(jnp.asarray(v1))
    v2, v3 = np.asarray(v2), np.asarray(v3)
    np.testing.assert_allclose(np.sum(v1 * v2, -1), 0, atol=1e-5)
    np.testing.assert_allclose(np.sum(v1 * v3, -1), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(v2, axis=-1), 1, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(v3, axis=-1), 1, atol=1e-5)


def test_degree_to_cartesian():
    # elevation 90 -> straight up (+y); az 0, el 0 -> +x horizon
    up = np.asarray(vm.degree_to_cartesian(0.0, 90.0))
    np.testing.assert_allclose(up, [0, 1, 0], atol=1e-6)
    horiz = np.asarray(vm.degree_to_cartesian(0.0, 0.0))
    np.testing.assert_allclose(horiz, [1, 0, 0], atol=1e-6)
    az90 = np.asarray(vm.degree_to_cartesian(90.0, 0.0))
    np.testing.assert_allclose(az90, [0, 0, 1], atol=1e-6)


def test_aabb_intersect_outside():
    pmin = jnp.array([0.0, 0.0, 0.0])
    pmax = jnp.array([1.0, 1.0, 1.0])
    ro = jnp.array([[-1.0, 0.5, 0.5]])
    rd = jnp.array([[1.0, 0.0, 0.0]])
    hit, tmin, tmax = vm.aabb_intersect(pmin, pmax, ro, rd)
    assert bool(hit[0])
    np.testing.assert_allclose(float(tmin[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(tmax[0]), 2.0, atol=1e-6)


def test_aabb_intersect_inside_returns_exit():
    """The reference's tmin<0 -> tmax rule (AABB.h:199-203)."""
    pmin = jnp.array([0.0, 0.0, 0.0])
    pmax = jnp.array([2.0, 2.0, 2.0])
    ro = jnp.array([[1.0, 1.0, 1.0]])
    rd = jnp.array([[0.0, 0.0, 1.0]])
    hit, tmin, tmax = vm.aabb_intersect(pmin, pmax, ro, rd)
    assert bool(hit[0])
    np.testing.assert_allclose(float(tmin[0]), 1.0, atol=1e-6)  # exit dist


def test_aabb_miss_behind():
    pmin = jnp.array([0.0, 0.0, 0.0])
    pmax = jnp.array([1.0, 1.0, 1.0])
    ro = jnp.array([[2.0, 0.5, 0.5]])
    rd = jnp.array([[1.0, 0.0, 0.0]])
    hit, _, _ = vm.aabb_intersect(pmin, pmax, ro, rd)
    assert not bool(hit[0])


def test_quaternion_identity():
    q = jnp.array([0.0, 0.0, 0.0, 1.0])
    m = np.asarray(vm.quaternion_to_mat4(q))
    np.testing.assert_allclose(m, np.eye(4), atol=1e-6)


def test_quaternion_z90():
    # 90 deg about z: x -> y (row-vector convention)
    s = np.sin(np.pi / 4)
    q = jnp.array([0.0, 0.0, s, np.cos(np.pi / 4)], jnp.float32)
    m = vm.quaternion_to_mat4(q)
    p = vm.transform_point(m, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(p), [0, 1, 0], atol=1e-6)


def test_transform_point_roundtrip():
    rng = np.random.RandomState(1)
    t = rng.randn(3).astype(np.float32)
    q = rng.randn(4).astype(np.float32)
    q /= np.linalg.norm(q)
    m = vm.compose_trs(jnp.asarray(t), jnp.asarray(q), jnp.float32(2.0))
    inv = vm.mat4_inverse(m)
    p = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    p2 = vm.transform_point(inv, vm.transform_point(m, p))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-4)


def test_compose_trs_order():
    """Scale, then rotate, then translate (main.cpp:1063-1099 order)."""
    s = np.sin(np.pi / 4)
    q = jnp.array([0.0, 0.0, s, np.cos(np.pi / 4)], jnp.float32)  # z+90
    m = vm.compose_trs(jnp.array([10.0, 0.0, 0.0]), q, jnp.float32(2.0))
    p = vm.transform_point(m, jnp.array([1.0, 0.0, 0.0]))
    # scale -> (2,0,0); rotate z90 -> (0,2,0); translate -> (10,2,0)
    np.testing.assert_allclose(np.asarray(p), [10, 2, 0], atol=1e-5)


def test_reflect():
    i = jnp.array([1.0, -1.0, 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    r = np.asarray(vm.reflect(i, n))
    np.testing.assert_allclose(r, [1, 1, 0], atol=1e-6)
