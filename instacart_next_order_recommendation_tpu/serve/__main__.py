from instacart_next_order_recommendation_tpu.serve.recommender import main

main()
