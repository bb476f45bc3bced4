"""Core numerics: pure-JAX, jit/vmap-safe ops shared by every layer.

Single source of truth — unlike the reference, which forks its core ops three
times (packaged / sweep / challenge-script copies, see reference
src/convexAdam/convex_adam_utils.py vs self_configuring/convexAdam_hyper_util.py).
"""
