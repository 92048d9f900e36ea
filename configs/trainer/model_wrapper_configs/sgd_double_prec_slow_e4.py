"""SGD 1e-4, double-precision state (parity: sgd_double_prec_slow_e4.py)."""
config = dict(optimizer="sgd", learning_rate=1e-4, momentum=0.9)
