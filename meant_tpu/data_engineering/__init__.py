"""Offline data-engineering ports (SURVEY.md §2.4, "Data eng" side stack).

Run-once file-to-file transformations rebuilt numpy/pandas/PIL-first:
  twitter       tweet scraping (snscrape-gated; env has no egress)
  av            AlphaVantage price fetch (network-gated)
  image_prep    chart-image -> (c, 224, 224) float arrays
  dataprep      daily tweets -> [SEP]-joined, tokenized 128-token arrays
  align_dates   re-index tweet tensors to dates that have graphs
  stocknet_prep per-ticker JSON tweets -> daily text CSVs
  snes          djiaNews merge + movement-ratio labels + 5-day shifts
  mosi_prep     CMU-MOSI aligned_50.pkl load + empty-text drop
  prepare_vqa   VQA-v2 annotations -> prepared npz records
"""
