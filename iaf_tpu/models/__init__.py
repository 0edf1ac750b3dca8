"""Model families: the CIFAR conv-latent IAF ResNet VAE (TF-stack parity)
and the MNIST vector-latent dense-MADE IAF VAE (Theano-stack parity).

Both expose the same functional API: ``init_params(cfg, rng, batch)`` and
``apply_fn(cfg, params, rng, x, mode, k)`` returning a NamedTuple with at
least (loss, elbo_nats, kl_obj, kl_cost, log_pxz, log_w).
"""

from iaf_tpu.core.config import Config


def get_model(cfg: Config):
    """Dispatch on the likelihood: bernoulli -> vector-latent MNIST model,
    dlogistic -> conv-latent CVAE."""
    if cfg.likelihood == "bernoulli":
        from iaf_tpu.models import mnist_vae
        return mnist_vae
    from iaf_tpu.models import cvae
    return cvae
