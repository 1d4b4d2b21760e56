"""Research sandboxes: anomalous-token probing, universal-trigger search."""
