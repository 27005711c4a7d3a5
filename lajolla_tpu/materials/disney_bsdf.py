"""Placeholder — implemented in a later milestone."""


def eval(scene, mat_id, dir_in, dir_out, hit, adjoint):
    raise NotImplementedError("disney_bsdf")


def pdf(scene, mat_id, dir_in, dir_out, hit, adjoint):
    raise NotImplementedError("disney_bsdf")


def sample(scene, mat_id, dir_in, hit, u2, w, adjoint):
    raise NotImplementedError("disney_bsdf")
