"""Placeholder — implemented in a later milestone."""


def eval(scene, mat_id, dir_in, dir_out, hit, adjoint):
    raise NotImplementedError("roughplastic")


def pdf(scene, mat_id, dir_in, dir_out, hit, adjoint):
    raise NotImplementedError("roughplastic")


def sample(scene, mat_id, dir_in, hit, u2, w, adjoint):
    raise NotImplementedError("roughplastic")
