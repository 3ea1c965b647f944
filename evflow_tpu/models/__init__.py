from . import kmeans, aeclustering, aeclustering_oracle
