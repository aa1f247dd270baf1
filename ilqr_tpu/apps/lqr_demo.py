"""Linear LQR closed-loop demo (CLI; capability of reference demo 0).

Solves the DARE for the reference's unstable 3-state system, prints P*/K*,
and plots open- vs closed-loop responses (scripts/0-lqr-demo.py).

Usage: python -m ilqr_tpu.apps.lqr_demo [--save out.png] [--no-viz]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="closed-loop LQR demo")
    parser.add_argument("--save", default=None)
    parser.add_argument("--no-viz", action="store_true")
    parser.add_argument("--steps", type=int, default=50)
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    from ilqr_tpu.solvers.lqr import lqr_demo

    # the reference's system (scripts/0-lqr-demo.py:24-27)
    A = jnp.asarray([[1.95, -0.025, -1.6], [1.6, 1.1, -3.2], [0.425, 0.185, 0.3]])
    B = jnp.asarray([[0.0, 1.0], [1.0, 1.0], [0.0, 1.0]])
    Q = jnp.eye(3)
    R = jnp.eye(2)
    x0 = jnp.asarray([1.0, 2.0, 3.0])
    P, K, ol, cl = lqr_demo(A, B, Q, R, x0, steps=args.steps)
    print(f"Pstar =\n{np.asarray(P)}")
    print(f"Kstar =\n{np.asarray(K)}")

    if args.no_viz:
        return 0
    import matplotlib
    if args.save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = np.arange(args.steps)
    for title, roll in (("Open Loop", ol), ("Closed Loop", cl)):
        fig, ax = plt.subplots(2, 2)
        for i in range(3):
            ax[i // 2, i % 2].plot(t, np.asarray(roll.x)[:, i])
            ax[i // 2, i % 2].set_xlabel("t")
            ax[i // 2, i % 2].set_ylabel(f"x_{i + 1}")
        ax[1, 1].plot(t, np.asarray(roll.u_norm))
        ax[1, 1].set_xlabel("t")
        ax[1, 1].set_ylabel("||u||")
        fig.suptitle(title)
        fig.subplots_adjust(wspace=0.4, hspace=0.4)
        if args.save:
            fig.savefig(args.save.replace(".", f"_{title.split()[0].lower()}.", 1))
    if not args.save:
        plt.show()
    return 0


if __name__ == "__main__":
    sys.exit(main())
