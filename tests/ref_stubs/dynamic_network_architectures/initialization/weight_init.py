def init_last_bn_before_add_to_0(module):  # no-op stub
    return module
