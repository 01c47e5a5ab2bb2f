from bcnf_tpu.plots.base import BasePlot
from bcnf_tpu.plots.data_plots import (
    DataConvariancePlot,
    DataCovariancePlot,
    DataDistributionPlot,
    corr_coeff,
    data_to_df,
)
from bcnf_tpu.plots.eval_plots import (
    plot_cdf_residuals,
    plot_impact_heatmap,
    plot_rank_histograms,
    plot_resimulation,
)

__all__ = [
    "BasePlot",
    "DataCovariancePlot",
    "DataConvariancePlot",
    "DataDistributionPlot",
    "corr_coeff",
    "data_to_df",
    "plot_rank_histograms",
    "plot_cdf_residuals",
    "plot_resimulation",
    "plot_impact_heatmap",
]
