"""AdaBelief GAN recipe: low beta1 + 2e-4 (parity: adabelief_gan.py)."""
config = dict(optimizer="adabelief", learning_rate=2e-4, beta1=0.5)
