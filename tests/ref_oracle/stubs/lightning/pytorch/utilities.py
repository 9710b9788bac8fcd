def grad_norm(module, norm_type=2.0):  # imported but unused by the oracle path
    return {}
