"""Plot base class (reference `src/bcnf/plots/core/base_plot.py:10-104`)."""

from __future__ import annotations

import os
from abc import ABC, abstractmethod

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import pandas as pd  # noqa: E402


class BasePlot(ABC):
    """create/save/show contract over a DataFrame of samples."""

    def __init__(self, data: pd.DataFrame) -> None:
        self.data = data
        self.column_names = list(data.columns)
        self.columns_count = len(self.column_names)
        self.figs: list[plt.Figure] = []

    @abstractmethod
    def create_plots(self) -> None: ...

    def save_plots(self, filepath: str, base_filename: str) -> None:
        os.makedirs(filepath, exist_ok=True)
        for i, fig in enumerate(self.figs):
            fig.savefig(os.path.join(filepath, f"{base_filename}_{i}.png"), dpi=300)

    def show_plots(self) -> None:
        for fig in self.figs:
            fig.show()
