"""Statistics layer: background-distribution fitting, p-values, corrections.

TPU-native reimagining of the reference stats chain (seekr/find_dist.py,
seekr/find_pval.py, seekr/adj_pval.py):

  * the O(m^2 * 4^k) background all-pairs Pearson runs on device as a
    blocked GEMM (``seekr_tpu.ops.pearson``)
  * the empirical p-value branch is an O(log N) device ``searchsorted``
    against the sorted background sample instead of the reference's O(N)
    Python loop per matrix cell (seekr/find_pval.py:157-164)
  * scipy distribution *fitting* stays on host (tiny data, iterative MLE —
    not a TPU workload), matching the survey build plan (SURVEY.md section 7)
  * multiple-test corrections are implemented in-house (numpy) because
    statsmodels is not a dependency of this framework
"""

from seekr_tpu.stats.multitest import multipletests
from seekr_tpu.stats.find_dist import find_dist
from seekr_tpu.stats.find_pval import find_pval
from seekr_tpu.stats.adj_pval import adj_pval

__all__ = ["multipletests", "find_dist", "find_pval", "adj_pval"]
