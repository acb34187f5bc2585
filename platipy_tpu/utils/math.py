"""Math utilities: prime generator + probability-threshold optimiser.

Drop-in mirror of platipy/imaging/utils/math.py (reference lines 23-179).
"""

from __future__ import annotations

import numpy as np

from platipy_tpu.utils.crop import crop_to_roi, label_to_roi

__all__ = ["gen_primes", "quick_optimise_probability"]


def gen_primes():
    """Generate an infinite sequence of prime numbers (incremental sieve)."""
    d = {}
    q = 2
    while True:
        if q not in d:
            yield q
            d[q * q] = [q]
        else:
            for p in d[q]:
                d.setdefault(p + q, []).append(p)
            del d[q]
        q += 1


def quick_optimise_probability(
    metric_function,
    manual_contour,
    probability_image,
    p_0: float = 0.5,
    delta: float = 0.5,
    tolerance: float = 0.01,
    mode: str = "min",
    create_figure: bool = False,
    auto_crop: bool = True,
    metric_args: dict = {},
    verbose: bool = True,
):
    """Shrinking-window sweep of the probability threshold against a metric
    (reference math.py:57-179).  Returns (optimal_probability, optimal_metric).
    """
    from platipy_tpu.label.fusion import process_probability_image

    if auto_crop:
        union = manual_contour.with_array(
            ((np.asarray(manual_contour.array) > 0)
             | (np.asarray(probability_image.array) > 0)).astype(np.uint8)
        )
        cb_size, cb_index = label_to_roi(union, expansion_mm=10)
        manual_contour = crop_to_roi(manual_contour, cb_size, cb_index)
        probability_image = crop_to_roi(probability_image, cb_size, cb_index)

    n_iter = 0
    p_best = p_0

    auto_contour = process_probability_image(probability_image, threshold=p_0)
    m_n = metric_function(manual_contour, auto_contour, **metric_args)
    m_best = m_n

    if verbose:
        print("Starting optimisation.")
        print(f"n = 0 | p = {p_best:.3f} | metric = {m_n:.3f}")

    p_list = [p_best]
    m_list = [m_best]
    improv = 0

    while np.abs(improv) > tolerance or n_iter <= 3:
        n_iter += 1
        m_n = m_best

        p_new = [
            p_best - 3 * delta / 4,
            p_best - delta / 2,
            p_best - delta / 4,
            p_best + delta / 4,
            p_best + delta / 2,
            p_best + 3 * delta / 4,
        ]
        m_new = [
            metric_function(
                manual_contour,
                process_probability_image(probability_image, threshold=p),
                **metric_args,
            )
            for p in p_new
        ]

        p_list = p_list + p_new
        m_list = m_list + m_new

        if mode == "min":
            p_best = p_list[int(np.argmin(m_list))]
            m_best = float(np.min(m_list))
        elif mode == "max":
            p_best = p_list[int(np.argmax(m_list))]
            m_best = float(np.max(m_list))

        improv = m_best - m_n
        delta /= 4

        if verbose:
            print(f"n = {n_iter} | p = {p_best:.3f} | metric = {m_best:.3f}")

    if create_figure:
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(1, 1)
        ax.scatter(p_list, m_list, c="k", zorder=1)
        ax.plot(*list(zip(*sorted(zip(p_list, m_list)))), c="k", zorder=1)
        ax.scatter((p_best,), (m_best,), c="r",
                   label=f"Optimum ({p_best:.2f},{m_best:.2f})", zorder=2)
        ax.set_xlim(0, 1)
        ax.set_xlabel("Probability Difference (from Optimal)")
        ax.set_ylabel("Metric Value")
        ax.grid()
        ax.set_axisbelow(True)
        ax.set_title(f"Optimiser | {metric_function.__name__}, mode = {mode}")
        fig.show()

    return p_best, m_best
