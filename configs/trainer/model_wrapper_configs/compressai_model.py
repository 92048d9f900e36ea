"""CompressAI-style RD optimizer config (parity: reference
model_wrapper_configs/compressai_model.py — main Adam 1e-4 + aux Adam
1e-3 on the entropy-bottleneck quantiles, loss_aux routing). Keys are
NeuralCodecTrainer / make_rd_optimizer kwargs."""
config = dict(optimizer="adam", learning_rate=1e-4,
              aux_learning_rate=1e-3, grad_clip=1.0)
