"""SGD momentum 0.9, double-precision state (parity: sgd_double_prec.py)."""
config = dict(optimizer="sgd", learning_rate=1e-2, momentum=0.9)
