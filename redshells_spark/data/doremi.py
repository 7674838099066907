"""DoReMi-style domain reweighting (one exponentiated-gradient step).

Xie et al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language
Model Pretraining" (arXiv:2305.10429) tunes pretraining domain weights
by Group DRO: at each step the proxy model's per-domain *excess loss*
over a reference model multiplies into the domain distribution through
an exponentiated-gradient update, then the distribution is smoothed
toward uniform. The full method iterates with model retraining; the
update rule itself is closed-form arithmetic over one row per domain —
this module implements exactly that step so a pipeline can re-weight
domains from any measured per-domain loss signal (held-out perplexity
from :mod:`redshells_spark.text.ngram_lm`, quality scores, downstream
eval loss) without a training loop.

    alpha'_k  ∝  alpha_k · exp(eta · max(0, loss_k − ref_k))
    weight_k  =  (1 − c) · alpha'_k / Σ alpha'  +  c / K

All arithmetic happens on a domain-count-sized relation (the corpus
pass that *produced* the losses is whatever aggregation the caller
ran); the output is meant to feed
:func:`redshells_spark.data.sampling.apply_mix_weights` or a sampler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def doremi_reweight(
    domain_losses: DataFrame,
    domain_column: str = "domain",
    loss_column: str = "loss",
    ref_loss_column: str | None = None,
    eta: float = 1.0,
    smoothing: float = 0.01,
    prior_column: str | None = None,
) -> DataFrame:
    """→ (domain, excess_loss, weight) — one exponentiated-gradient
    update from per-domain losses.

    ``ref_loss_column`` holds the reference model's loss; when None the
    corpus-wide *minimum* loss stands in (every domain's excess is
    measured against the best-compressing domain — a deterministic,
    model-free baseline). ``prior_column`` is the current mixture
    alpha (defaults to uniform). ``smoothing`` is DoReMi's c: the
    uniform mass mixed back in so no domain ever starves. Doubles are
    rounded to 4 decimals after normalization."""
    require_columns(domain_losses, [domain_column, loss_column])
    if not 0.0 <= smoothing <= 1.0:
        raise ValueError(f"smoothing must be in [0, 1], got {smoothing}")
    w = Window.partitionBy()  # domain-count-sized relation — bounded
    loss = F.col(loss_column).cast("double")
    ref = (
        F.col(ref_loss_column).cast("double")
        if ref_loss_column
        else F.min(loss).over(w)
    )
    excess = F.greatest(loss - ref, F.lit(0.0))
    prior = (
        F.col(prior_column).cast("double") if prior_column else F.lit(1.0)
    )
    alpha = prior * F.exp(F.lit(float(eta)) * excess)
    k = F.count(F.lit(1)).over(w)
    weight = (1.0 - smoothing) * alpha / F.sum(alpha).over(w) + smoothing / k
    return domain_losses.select(
        F.col(domain_column).alias("domain"),
        F.round(excess, 4).alias("excess_loss"),
        F.round(weight, 4).alias("weight"),
    )
