"""Distributed-tile matrix profile must equal the single-task kernel
exactly (the reference's distributed-parity methodology,
tests/test_stumped.py analog)."""

import numpy as np
import numpy.testing as npt

from stumpy_spark import kernels
from stumpy_spark.plans.longseq import distributed_matrix_profile


def test_distributed_equals_single_task(spark):
    rs = np.random.RandomState(42)
    T = rs.uniform(-1000, 1000, 3000)
    m = 25
    got = (distributed_matrix_profile(spark, T, m, tile=512)
           .toPandas().sort_values("i").reset_index(drop=True))
    P, I, IL, IR, PL, PR = kernels.matrix_profile(
        T, m, return_left_right_P=True)
    npt.assert_almost_equal(P[:, 0], got.P.to_numpy(), decimal=10)
    npt.assert_array_equal(I[:, 0], got.I.to_numpy())
    npt.assert_array_equal(IL, got.IL.to_numpy())
    npt.assert_array_equal(IR, got.IR.to_numpy())
    npt.assert_almost_equal(PL, got.PL.to_numpy(), decimal=10)


def test_distributed_with_nans(spark):
    rs = np.random.RandomState(7)
    T = rs.uniform(-1000, 1000, 1200)
    T[100] = np.nan
    T[700] = np.inf
    m = 10
    got = (distributed_matrix_profile(spark, T, m, tile=256)
           .toPandas().sort_values("i").reset_index(drop=True))
    P, I, _, _ = kernels.matrix_profile(T, m)
    npt.assert_almost_equal(P[:, 0], got.P.to_numpy(), decimal=10)
    npt.assert_array_equal(I[:, 0], got.I.to_numpy())


def test_distributed_ab_join(spark):
    rs = np.random.RandomState(9)
    T_A = rs.uniform(-1000, 1000, 1500)
    T_B = rs.uniform(-1000, 1000, 900)
    m = 20
    got = (distributed_matrix_profile(spark, T_A, m, tile=256, T_B=T_B)
           .toPandas().sort_values("i").reset_index(drop=True))
    P, I, _, _ = kernels.matrix_profile(T_A, m, T_B=T_B)
    npt.assert_almost_equal(P[:, 0], got.P.to_numpy(), decimal=10)
    npt.assert_array_equal(I[:, 0], got.I.to_numpy())
