"""Training-data-pipeline operators + driver-contract query registry."""
