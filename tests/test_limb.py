"""Parity tests: device limb arithmetic vs the exact host golden model."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proof_systems_tpu.fields import Fp, Fq
from proof_systems_tpu.ops import limb

FIELDS = [Fp, Fq]


def rand_elems(field, n, rng):
    special = [0, 1, 2, field.p - 1, field.p - 2, (field.p - 1) // 2, 1 << 255 % field.p]
    xs = [s % field.p for s in special]
    xs += [rng.randrange(field.p) for _ in range(n - len(xs))]
    return xs


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_pack_roundtrip(field):
    rng = random.Random(0)
    xs = rand_elems(field, 32, rng)
    F = limb.device_field(field)
    arr = F.pack(xs)
    assert arr.shape == (16, 32)
    assert F.unpack(arr) == xs
    arr_m = F.pack_mont(xs)
    assert F.unpack_mont(arr_m) == xs


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(field):
    rng = random.Random(1)
    n = 64
    xs, ys = rand_elems(field, n, rng), rand_elems(field, n, rng)
    F = limb.device_field(field)
    a, b = F.pack(xs), F.pack(ys)
    assert F.unpack(limb.add(F, a, b)) == [field.add(x, y) for x, y in zip(xs, ys)]
    assert F.unpack(limb.sub(F, a, b)) == [field.sub(x, y) for x, y in zip(xs, ys)]
    assert F.unpack(limb.neg(F, a)) == [field.neg(x) for x in xs]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mont_mul(field):
    rng = random.Random(2)
    n = 64
    xs, ys = rand_elems(field, n, rng), rand_elems(field, n, rng)
    F = limb.device_field(field)
    a, b = F.pack_mont(xs), F.pack_mont(ys)
    got = F.unpack_mont(limb.mont_mul(F, a, b))
    assert got == [field.mul(x, y) for x, y in zip(xs, ys)]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mont_roundtrip_and_sqr(field):
    rng = random.Random(3)
    xs = rand_elems(field, 32, rng)
    F = limb.device_field(field)
    a = F.pack(xs)
    am = limb.to_mont(F, a)
    assert F.unpack_mont(am) == xs
    back = limb.from_mont(F, am)
    assert F.unpack(back) == xs
    assert F.unpack_mont(limb.mont_sqr(F, am)) == [field.mul(x, x) for x in xs]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_pow_and_inv(field):
    rng = random.Random(4)
    xs = rand_elems(field, 16, rng)
    F = limb.device_field(field)
    a = F.pack_mont(xs)
    e = rng.randrange(1 << 200)
    assert F.unpack_mont(limb.mont_pow(F, a, e)) == [field.pow(x, e) for x in xs]
    got_inv = F.unpack_mont(limb.inv(F, a))
    assert got_inv == [field.inv(x) if x else 0 for x in xs]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_batch_inverse(field):
    rng = random.Random(5)
    xs = rand_elems(field, 40, rng)
    xs[7] = 0
    xs[20] = 0
    F = limb.device_field(field)
    a = F.pack_mont(xs)
    got = F.unpack_mont(limb.batch_inverse(F, a))
    assert got == [field.inv(x) if x else 0 for x in xs]


def test_multidim_batch():
    rng = random.Random(6)
    field = Fp
    F = limb.device_field(field)
    xs = rand_elems(field, 24, rng)
    ys = rand_elems(field, 24, rng)
    a = F.pack_mont(xs, shape=(4, 6))
    b = F.pack_mont(ys, shape=(4, 6))
    got = F.unpack_mont(limb.mont_mul(F, a, b))
    assert got == [field.mul(x, y) for x, y in zip(xs, ys)]


def test_jit_and_grad_free_compile():
    field = Fp
    F = limb.device_field(field)
    rng = random.Random(7)
    xs = rand_elems(field, 16, rng)
    ys = rand_elems(field, 16, rng)
    f = jax.jit(lambda a, b: limb.mont_mul(F, limb.add(F, a, b), b))
    got = F.unpack_mont(f(F.pack_mont(xs), F.pack_mont(ys)))
    assert got == [field.mul(field.add(x, y), y) for x, y in zip(xs, ys)]


def test_is_zero_eq_select():
    field = Fp
    F = limb.device_field(field)
    xs = [0, 5, 0, 7]
    a = F.pack(xs)
    assert list(np.asarray(limb.is_zero(F, a))) == [True, False, True, False]
    b = F.pack([0, 5, 1, 8])
    assert list(np.asarray(limb.eq(F, a, b))) == [True, True, False, False]
    sel = limb.select(jnp.asarray([True, False, True, False]), a, b)
    assert F.unpack(sel) == [0, 5, 0, 8]
