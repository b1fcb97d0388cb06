"""Pure-JAX workload models: MLPs, ResNet-18, All-CNN-C, analytic targets."""
