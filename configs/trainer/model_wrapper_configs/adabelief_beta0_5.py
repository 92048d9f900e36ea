"""AdaBelief with beta1=0.5 (GAN-style; parity: adabelief_beta0_5.py)."""
config = dict(optimizer="adabelief", learning_rate=1e-4, beta1=0.5)
